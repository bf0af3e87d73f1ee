"""Reusable column-expression library (all JVM-side built-ins — the
engine's scalar vocabulary; SURVEY.md §2.C C10 lists the reference's own
vocabulary as now()/lower()/md5, fully covered here)."""

from .vectors import cosine_similarity, dot, euclidean_distance, l2_norm  # noqa: F401
from .texts import (  # noqa: F401
    bag_of_words_fingerprint,
    hex_hash60,
    tokens,
    word_ngrams,
)
