"""Record linkage and URL canonicalization — the identity-resolution
half of a corpus curation pipeline (CCNet/C4-style URL dedup; blocked
fuzzy matching for near-identical entity names).

Engine-portable by construction: every transformation is regex/string
expressions available identically in Spark (Java regex) and DuckDB
(RE2) — the patterns below deliberately avoid lookarounds and other
non-RE2 syntax so both engines execute the same automaton.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url: str | Column) -> Column:
    """Aggressive URL canonicalization (the Common-Crawl dedup form):
    lowercase scheme and host, strip a leading ``www.``, strip default
    ports ``:80``/``:443``, drop the entire query string and fragment,
    collapse trailing slashes; an empty path becomes ``/``.

    Emitted as pure string/regex expressions (whole-stage codegen, no
    UDF); the DuckDB oracle runs the literally identical pipeline, so
    canonical keys are bit-identical across engines."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(443|80)$", "")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # Schemeless/malformed URLs would all extract to ':///'; keep the raw
    # string as its own key instead so unparseable URLs never collapse
    # into one dup group (only byte-identical ones still dedup).
    return F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+"),
                  F.concat(scheme, F.lit("://"), host, path)).otherwise(u)


def url_dedup_groups(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Group documents by canonical URL: (canonical_url, keep_id =
    min id, dup_count).  One hash aggregate on the canonical string —
    the l01 exact-dedup shape with canonicalization fused into the
    scan (no extra pass, no UDF)."""
    return (df.select(F.col(id_col).alias("id"),
                      canonical_url(url_col).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.min("id").alias("keep_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def fuzzy_match_pairs(df: DataFrame, name_col: str, block: Column,
                      max_distance: int = 3) -> DataFrame:
    """Blocked fuzzy record linkage over DISTINCT names: candidate
    pairs share a blocking key, then an exact Levenshtein rerank keeps
    pairs within `max_distance` edits (name_a < name_b once each).

    Scale shape: names are deduplicated BEFORE pairing, so the
    self-join cost is quadratic in per-block VOCABULARY, not corpus
    rows — with a well-chosen block (suffix token, phonetic key,
    length band) per-block name counts are bounded by the domain, not
    the data.  Levenshtein is the only non-codegen expression and runs
    post-block on the reranked candidate set alone."""
    names = (df.select(F.col(name_col).alias("name"), block.alias("blk"))
             .distinct())
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    return (a.join(b, "blk")
            .filter(F.col("name_a") < F.col("name_b"))
            .withColumn("lev", F.levenshtein("name_a", "name_b"))
            .filter(F.col("lev") <= max_distance)
            .select("blk", "name_a", "name_b", "lev"))
