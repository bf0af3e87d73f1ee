CREATE TABLE IF NOT EXISTS widgets (widget_id UInt32, label String) ENGINE = MergeTree PARTITION BY tuple() ORDER BY tuple(widget_id)
