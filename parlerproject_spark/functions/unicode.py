"""Unicode text normalization (ftfy-lite for a web corpus).

Web-scraped training text (the reference corpus is scraped HTML —
code/htmlConverter.py) arrives with typographic quotes, NBSP,
zero-width characters, stray C0 controls, and decomposed accents.
Every serious corpus pipeline canonicalizes these before
tokenization/dedup, otherwise "café" and "café" (NFC vs NFD) are
different shingles and different vocab entries.

Two layers:
- `clean_chars` — pure JVM Column chain (translate + replace +
  regexp_replace): NBSP→space, curly quotes/dashes→ASCII,
  zero-width removal, ellipsis→"...", C0-control strip (keeping
  \\n and \\t). Whole-stage-codegen friendly, zero Python.
- `nfc` — Unicode NFC composition via an Arrow pandas_udf over
  stdlib `unicodedata` (Spark has no built-in normalizer). The
  DuckDB oracle uses its native `nfc_normalize` — two independent
  implementations of the same Unicode standard algorithm, so a
  hash match is a genuine cross-implementation check.
- `normalize_text` = nfc(clean_chars(x)) — the composed op.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# char -> char rewrites (translate: positional mapping); escapes, not
# raw glyphs, so no tool in the edit chain can mangle the mapping
_MAP_FROM = "\u00a0\u2018\u2019\u201c\u201d\u2013\u2014"
_MAP_TO = " ''\"\"--"
# deleted outright (zero-width space/non-joiner/joiner, BOM, word-joiner)
_ZERO_WIDTH = "\u200b\u200c\u200d\ufeff\u2060"
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean_chars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _MAP_FROM + _ZERO_WIDTH, _MAP_TO)
    c = F.replace(c, F.lit("\u2026"), F.lit("..."))
    return F.regexp_replace(c, _CONTROL_RE, "")


# DataType object, not a DDL string: a "string" literal would be
# parsed through the active SparkContext at import time, making the
# module unimportable before a session exists
@pandas_udf(StringType())
def nfc(s: pd.Series) -> pd.Series:
    import unicodedata
    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


def normalize_text(col: Column | str) -> Column:
    """Character cleanup, then NFC composition — apply before
    tokenize/shingle/dedup so canonically-equal text is byte-equal."""
    return nfc(clean_chars(col))
