"""URL canonicalization + host blocklist filtering — the stage every
Common-Crawl-scale pipeline runs before anything touches page text
(the north-rule input is (url, warc_ts, html, text, lang) pages; the
reference has no URL hygiene at all — its loaders key raw strings).

Canonicalization (the standard crawl rules): strip the fragment,
lowercase the scheme://host[:port] prefix (path/query case is
significant and kept), drop the scheme's default port, and strip
tracking parameters (utm_*, fbclid) wherever they sit in the query
string.  Everything is a fixed chain of regexp rewrites in the
RE2 ∩ java.util.regex common dialect (no lookaround), so the DuckDB
oracle runs the same expressions — only the backreference spelling
differs ($1 vs \\1).

Scale shape: pure narrow Catalyst string expressions (zero shuffle);
the blocklist join broadcasts a bounded host list.  Linear at any
corpus size; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tracking params dropped during canonicalization
_TRACK = r"(utm_[a-z_]*|fbclid)"


def canonical_url(col="url"):
    """the canonicalization expression chain (each step mirrored
    one-for-one in queries.sql_url_canonicalize):

    1. strip ``#fragment``
    2. lowercase the scheme and the host[:port] — but NOT any
       userinfo, whose case is significant (credentials)
    3. drop default ports (http :80, https :443), userinfo-tolerant
    4. strip tracking params INSIDE the query string only — the url is
       split at the first ``?`` so a literal ``&utm_x=v`` in a path
       is never rewritten: mid-query ``&utm_x=v``, then a leading
       ``?utm_x=v&`` (promoting the next param), then a lone
       ``?utm_x=v`` tail

    (IPv6 bracket authorities are out of scope — the pipeline's page
    keys are hostnames.)
    """
    u = F.regexp_replace(F.col(col), r"#.*$", "")
    scheme = F.regexp_extract(u, r"^([^:/?#]+)://", 1)
    userinfo = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*@)", 1)
    hostport = F.regexp_extract(
        u, r"^[^:/?#]+://(?:[^/?#]*@)?([^/?#]*)", 1
    )
    rest = F.regexp_replace(u, r"^[^:/?#]+://[^/?#]*", "")
    u = F.concat(
        F.lower(scheme), F.lit("://"), userinfo, F.lower(hostport), rest
    )
    u = F.regexp_replace(
        u, r"^(http://(?:[^/?#]*@)?[^/?#:]*):80([/?#].*)?$", "$1$2"
    )
    u = F.regexp_replace(
        u, r"^(https://(?:[^/?#]*@)?[^/?#:]*):443([/?#].*)?$", "$1$2"
    )
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_extract(u, r"^[^?]*(\?.*)$", 1)
    q = F.regexp_replace(q, rf"&{_TRACK}=[^&#]*", "")
    q = F.regexp_replace(q, rf"^\?{_TRACK}=[^&#]*&", "?")
    q = F.regexp_replace(q, rf"^\?{_TRACK}=[^&#]*$", "")
    return F.concat(base, q)


def url_host(col):
    """registrable host of an ALREADY-canonicalized url (scheme and
    host are lowercase by then): the authority minus any userinfo
    (greedy up to the last ``@`` — anything before the path with an
    ``@`` is userinfo per RFC 3986) and minus any port."""
    return F.regexp_extract(col, r"^[a-z]+://(?:[^/?#]*@)?([^/?#:]+)", 1)


def canonicalize_urls(pages: DataFrame, blocklist: DataFrame) -> DataFrame:
    """→ (doc_id, canon_url, host, blocked): canonicalized url, its
    host, and whether the host sits on ``blocklist`` (one ``host``
    column; broadcast — blocklists are bounded, corpora are not).
    Input needs (doc_id, url)."""
    canon = pages.select(
        "doc_id", canonical_url().alias("canon_url")
    ).withColumn("host", url_host(F.col("canon_url")))
    hit = blocklist.select("host", F.lit(True).alias("blocked")).distinct()
    return canon.join(F.broadcast(hit), "host", "left").select(
        "doc_id",
        "canon_url",
        "host",
        F.coalesce("blocked", F.lit(False)).alias("blocked"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """→ (key, status, old_hash, new_hash): crawl-epoch diff — the
    incremental-recrawl primitive (which pages appeared, vanished, or
    changed content between two snapshots of the same crawl).  Content
    identity is md5 of the whitespace-normalized text (the ONE dedup
    content-hash convention); ``status`` ∈ added / removed / changed /
    unchanged.

    Scale shape: two narrow hash projections + one full-outer join on
    the unique page key — both sides pre-hashed on it, linear, no
    skew (keys are unique per side).  Inputs need (key, text)."""
    from .dedup import normalized_text

    oh = old.select(F.col(key), F.md5(normalized_text()).alias("old_hash"))
    nh = new.select(F.col(key), F.md5(normalized_text()).alias("new_hash"))
    j = oh.join(nh, key, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(key), status.alias("status"), "old_hash", "new_hash")
