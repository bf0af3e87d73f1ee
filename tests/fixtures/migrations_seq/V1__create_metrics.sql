CREATE TABLE IF NOT EXISTS metrics (id UInt32, score UInt32)
ENGINE = MergeTree PARTITION BY tuple() ORDER BY tuple(id)
