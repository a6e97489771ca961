"""Keyed remote-object fetch (SURVEY S9/M5).

The reference wget's one image per second from S3, appending a
status line per file (code/data_processing_scripts/
download_image_files.py:25-40). Spark-first shape: the listing is a
DataFrame, the fetch is a `mapInPandas` stage emitting
(filename, status, content) — the reference's exact error taxonomy
(`success` / `connection_error` / `error`) as a column, the binary
payload as a multimodal BinaryType column, resume via anti-join on
the status log (operators.relational.anti_join).

No live HTTP in this environment: the default fetcher is a
deterministic fake keyed on the url (real plumbing, fake bytes);
pass fetcher="http" to use urllib, rate-limited per-partition the
way the reference sleeps per file.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = "filename string, status string, content binary"


def _fake_fetch(url: str) -> tuple[str, bytes]:
    """Deterministic offline fetcher: bytes derived from the url.
    Urls containing 'missing' simulate connection errors — keeps the
    error-taxonomy path testable without a network."""
    if "missing" in url:
        return "connection_error", b""
    payload = hashlib.md5(url.encode()).digest() * 4
    return "success", payload


def _http_fetch(url: str, timeout: float = 10.0) -> tuple[str, bytes]:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return "success", resp.read()
    except urllib.error.URLError:
        return "connection_error", b""
    except Exception:
        return "error", b""


def fetch_objects(listing: DataFrame, *, base_url: str,
                  filename_col: str = "filename",
                  fetcher: str = "fake",
                  rate_limit_per_sec: float | None = None) -> DataFrame:
    """listing(filename, ...) → (filename, status, content).

    mapInPandas so each Arrow batch is fetched inside one Python
    worker with connection reuse; `rate_limit_per_sec` is the
    reference's sleep(1) backpressure (I4), applied per task so the
    cluster-wide rate is tasks × limit — set it from the remote
    service's budget, not from the task count.
    """
    fetch = _fake_fetch if fetcher == "fake" else _http_fetch
    delay = 1.0 / rate_limit_per_sec if rate_limit_per_sec else 0.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for name in pdf[filename_col]:
                status, content = fetch(base_url + name)
                out.append((name, status, content))
                if delay:
                    time.sleep(delay)
            yield pd.DataFrame(out, columns=["filename", "status", "content"])

    work = listing.select(filename_col)
    return work.mapInPandas(run, FETCH_SCHEMA)


def resume_fetch(listing: DataFrame, status_log: DataFrame, *, base_url: str,
                 filename_col: str = "filename", **kw) -> DataFrame:
    """Fetch only what has no `success` row in the log — the
    reference's resume-at-offset (download_image_files.py:20-23)
    done by keys instead of positions."""
    done = status_log.filter(F.col("status") == "success").select(filename_col)
    from parlerproject_spark.operators.relational import anti_join
    todo = anti_join(listing, done, filename_col)
    return fetch_objects(todo, base_url=base_url, filename_col=filename_col, **kw)
