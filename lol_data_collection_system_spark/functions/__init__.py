"""Scalar function families (SURVEY.md §2.8) — the single import surface
for the column-level building blocks, re-exported from their canonical
implementations next to the operators that exercise them.

Families → canonical homes:
- string/tokenize:   `operators.text` (tokens, counts, normalization)
- hashing/encoding:  `operators.text.fingerprint`, `sampling.sample_bucket`,
                     `packing.pack_order` (all md5-based, engine-portable)
- array/vector math: `operators.similarity` (dot, l2_norm, cosine, LSH bucket)
- conditional/rule:  `operators.text.quality_filter_flags` rule exprs
- date/math/map/JSON: exercised inline in `plans/` queries via
  `pyspark.sql.functions` (no wrappers worth owning)

Everything here is a pure `Column -> Column` expression (JVM-evaluated,
codegen-friendly); nothing allocates a DataFrame or forces a job.
"""

from ..operators.packing import pack_order
from ..operators.sampling import sample_bucket
from ..operators.similarity import cosine, dot, l2_norm, sign_lsh_bucket
from ..operators.text import (
    bpe_ish_piece_count,
    fingerprint,
    normalized_text,
    token_count,
    tokens,
    winnow_signature,
)

__all__ = [
    "bpe_ish_piece_count",
    "cosine",
    "dot",
    "fingerprint",
    "l2_norm",
    "normalized_text",
    "pack_order",
    "sample_bucket",
    "sign_lsh_bucket",
    "token_count",
    "tokens",
    "winnow_signature",
]
