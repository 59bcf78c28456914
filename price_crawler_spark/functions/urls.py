"""URL scalar functions (SURVEY.md §2.3 F11-F12, generalized per the north
rule: canonical_url → xxhash64 keys the URL-seen dedup).

The canonicalizer generalizes the reference's ad-hoc id extraction
(/root/reference/app/scrapers/sunfar.py:55-64 — ``url.split('id=')[1]``) into
a full, idempotent canonical form:

    1. strip fragment
    2. lowercase scheme and host
    3. strip default ports (:80 http, :443 https) and trailing host dots
    4. collapse duplicate slashes in path; '' → '/'; strip trailing slash
    5. drop tracking params (utm_*, fbclid, gclid, ref) and empty params
    6. sort remaining query params bytewise

Everything is a native Column expression chain (regexp + higher-order array
functions) so the 10^10-row frontier pass stays inside whole-stage codegen;
the identical algorithm is expressible in DuckDB SQL for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|ref)="


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_with_host(col: Column | str) -> Column:
    """(canonical_url, host) as ONE struct expression. The host subtree is
    shared with the canonical-url subtree, so Catalyst's subexpression
    elimination parses the URL once — `select(canonicalize_url(u),
    url_host(u))` as two separate expressions parses it twice."""
    u = F.trim(_col(col))
    u = F.regexp_replace(u, r"#.*$", "")

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(tail, r"^([^?#]*)", 1)
    qs = F.regexp_extract(tail, r"\?([^#]*)", 1)

    host = F.regexp_replace(hostport, r"\.+(:\d*)?$", "$1")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )

    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)

    params = F.split(qs, "&")
    kept = F.filter(
        params,
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qs_norm = F.array_join(F.array_sort(kept), "&")

    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs_norm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs_norm)),
    )
    bare_host = F.regexp_replace(host, r":\d+$", "")
    return F.struct(
        canonical.alias("canonical_url"), bare_host.alias("host")
    )


def canonicalize_url(col: Column | str) -> Column:
    u = F.trim(_col(col))
    u = F.regexp_replace(u, r"#.*$", "")  # strip fragment

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(tail, r"^([^?#]*)", 1)
    qs = F.regexp_extract(tail, r"\?([^#]*)", 1)

    # trailing host dots (no lookahead: DuckDB's RE2 silently ignores (?=...),
    # so both mirrors use a capture group instead)
    host = F.regexp_replace(hostport, r"\.+(:\d*)?$", "$1")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )

    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)

    params = F.split(qs, "&")
    kept = F.filter(
        params,
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qs_norm = F.array_join(F.array_sort(kept), "&")

    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs_norm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs_norm)),
    )


# ---------------------------------------------------------------------------
# Arrow-batch variant of the canonicalizer (A/B alternative to the expression
# chain above; same algorithm, same output — parity is pytest-gated against
# both the Column chain and the pure-Python mirror in tests/oracle_crawler.py)
# ---------------------------------------------------------------------------
#
# Why it exists: the ~15-step regexp_replace/regexp_extract chain is the
# frontier hot path's bandwidth hog (each step materializes a new UTF8String
# in the JVM heap; 19M URLs × 15 passes = GC + memory-bus pressure that caps
# single-box N→4N scaling). This variant ships each partition to a Python
# worker ONCE over Arrow, canonicalizes with str slicing + 3 precompiled
# regexes (each applied only on the rare rows that need them), and returns
# the (canonical_url, host) struct in one batch. Python workers are separate
# processes, so the work also escapes the single shared JVM heap — on a real
# cluster either form scales; on one box this one scales measurably better
# (A/B numbers in BASELINE.md).

import re as _re

_SCHEME_RE = _re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")
_HOSTDOTS_RE = _re.compile(r"\.+(:\d*)?$")
_SLASHRUN_RE = _re.compile(r"/{2,}")
_PORT_RE = _re.compile(r":\d+$")


def _canon_pair_py(url):
    """(canonical_url, bare_host) — algorithm identical to
    :func:`canonicalize_with_host`, step numbers from the module docstring."""
    if url is None:
        return None, None
    u = url.strip(" ")  # spaces only, matching F.trim / DuckDB trim()
    h = u.find("#")  # 1. strip fragment
    if h != -1:
        u = u[:h]
    m = _SCHEME_RE.match(u)
    if m:  # 2. lowercase scheme
        scheme = m.group(1).lower()
        rest = u[m.end():]
    else:
        scheme = ""
        rest = u
    cut = len(rest)
    i = rest.find("/")
    if i != -1:
        cut = i
    i = rest.find("?")
    if i != -1 and i < cut:
        cut = i
    hostport = rest[:cut].lower()
    tail = rest[cut:]
    qi = tail.find("?")
    if qi == -1:
        path, qs = tail, ""
    else:
        path, qs = tail[:qi], tail[qi + 1:]
    # 3. trailing host dots + default ports (regex only when plausibly needed)
    host = _HOSTDOTS_RE.sub(r"\1", hostport) if "." in hostport else hostport
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    # 4. collapse duplicate slashes; '' → '/'; strip trailing slash
    if "//" in path:
        path = _SLASHRUN_RE.sub("/", path)
    if path == "":
        path = "/"
    elif path != "/" and path.endswith("/"):
        path = path[:-1]
    # 5./6. drop tracking + empty params, sort bytewise
    if qs:
        kept = []
        for p in qs.split("&"):
            if not p:
                continue
            name = p.partition("=")
            if name[1] and (
                name[0].startswith("utm_") or name[0] in ("fbclid", "gclid", "ref")
            ):
                continue
            kept.append(p)
        kept.sort()
        qsn = "&".join(kept)
    else:
        qsn = ""
    canonical = f"{scheme}://{host}{path}" + (f"?{qsn}" if qsn else "")
    bare_host = _PORT_RE.sub("", host)
    return canonical, bare_host


def _canon_batch_pa(arr):
    """Vectorized (canonical_url, host) over a ``pyarrow`` string array —
    every step is a C++ compute kernel over contiguous buffers, so per-URL
    Python object churn is zero. Algorithm identical to
    :func:`canonicalize_with_host` / :func:`_canon_pair_py`; parity is
    pytest-gated against both. The only numpy round-trip is the per-batch
    list-offset rebuild for the query-param sort (arrow has no per-list
    sort kernel), which is O(rows), not O(bytes).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # spaces ONLY — the expression chain's F.trim and the DuckDB oracle's
    # trim() strip ' ' alone, so tab/newline padding must survive here too
    # for the three impls to canonicalize identically (ADVICE r3)
    u = pc.utf8_trim(arr, " ")
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    sm = pc.extract_regex(u, r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://")
    scheme = pc.utf8_lower(
        pc.if_else(pc.is_valid(sm), pc.struct_field(sm, "s"), "")
    )
    rest = pc.replace_substring_regex(
        u, pattern=r"^[A-Za-z][A-Za-z0-9+.\-]*://", replacement=""
    )
    hostport = pc.utf8_lower(
        pc.struct_field(pc.extract_regex(rest, r"^(?P<h>[^/?#]*)"), "h")
    )
    tail = pc.replace_substring_regex(rest, pattern=r"^[^/?#]*", replacement="")
    path = pc.struct_field(pc.extract_regex(tail, r"^(?P<p>[^?#]*)"), "p")
    qm = pc.extract_regex(tail, r"\?(?P<q>[^#]*)")
    qs = pc.if_else(pc.is_valid(qm), pc.struct_field(qm, "q"), "")

    host = pc.replace_substring_regex(
        hostport, pattern=r"\.+(:\d*)?$", replacement=r"\1"
    )
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, pattern=r":80$", replacement=""),
        host,
    )
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, pattern=r":443$", replacement=""),
        host,
    )

    path = pc.replace_substring_regex(path, pattern=r"/{2,}", replacement="/")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    path = pc.if_else(
        pc.equal(path, "/"),
        path,
        pc.replace_substring_regex(path, pattern=r"/$", replacement=""),
    )

    # query params: split → flatten → drop tracking/empty → one stable
    # multi-key sort over (row, param) → rebuild offsets → binary_join
    parts = pc.split_pattern(qs, "&")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts)
    keep = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, TRACKING_PARAM_PATTERN)),
    )
    flat_k = pc.filter(flat, keep)
    parent_k = pc.filter(parent, keep)
    order = pc.sort_indices(
        pa.table({"p": parent_k, "v": flat_k}),
        sort_keys=[("p", "ascending"), ("v", "ascending")],
    )
    vk = pc.take(flat_k, order)
    if isinstance(vk, pa.ChunkedArray):
        vk = vk.combine_chunks()
    counts = np.bincount(np.asarray(parent_k), minlength=len(arr))
    offsets = np.zeros(len(arr) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    qsn = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), vk), "&"
    )

    canonical = pc.binary_join_element_wise(
        scheme,
        "://",
        host,
        path,
        pc.if_else(
            pc.equal(qsn, ""), "", pc.binary_join_element_wise("?", qsn, "")
        ),
        "",
    )
    bare_host = pc.replace_substring_regex(host, pattern=r":\d+$", replacement="")
    return canonical, bare_host


def canonicalize_with_host_arrow(col: Column | str) -> Column:
    """Arrow-batch twin of :func:`canonicalize_with_host`.

    Same output struct, same algorithm; see the block comment above for when
    to prefer it. Uses a native ``arrow_udf`` (PySpark ≥ 4.0: pyarrow
    arrays in and out, no pandas object round-trip) over the vectorized
    kernel pipeline in :func:`_canon_batch_pa`; falls back to a pandas UDF
    around the same kernels on older runtimes. Declared lazily so importing
    this module never forces a pandas/pyarrow import on executors that
    don't use it.
    """
    try:
        from pyspark.sql.functions import arrow_udf
    except ImportError:
        arrow_udf = None

    if arrow_udf is not None:
        # explicit ArrowUDFType.SCALAR: this module uses
        # `from __future__ import annotations`, which turns type hints into
        # strings that arrow_udf's hint inference can't resolve
        from pyspark.sql.functions import ArrowUDFType

        @arrow_udf("canonical_url string, host string", ArrowUDFType.SCALAR)
        def _canon_udf(urls):
            import pyarrow as pa

            canonical, bare_host = _canon_batch_pa(urls)
            return pa.StructArray.from_arrays(
                [canonical, bare_host], names=["canonical_url", "host"]
            )

        return _canon_udf(_col(col))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("canonical_url string, host string")
    def _canon_udf_pd(urls):
        import pandas as pd
        import pyarrow as pa

        canonical, bare_host = _canon_batch_pa(pa.Array.from_pandas(urls))
        return pd.DataFrame(
            {
                "canonical_url": canonical.to_pandas(),
                "host": bare_host.to_pandas(),
            }
        )

    return _canon_udf_pd(_col(col))


DUCKDB_CANONICAL_CTE = r"""
canon_base AS (
    SELECT *, regexp_replace(trim({url_expr}), '#.*$', '') AS _u
    FROM {source}
),
canon_split AS (
    SELECT *,
        lower(regexp_extract(_u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS _scheme,
        regexp_replace(_u, '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS _rest
    FROM canon_base
),
canon_parts AS (
    SELECT *,
        lower(regexp_extract(_rest, '^([^/?#]*)', 1)) AS _hostport,
        regexp_replace(_rest, '^[^/?#]*', '') AS _tail
    FROM canon_split
),
canon_pieces AS (
    SELECT *,
        regexp_extract(_tail, '^([^?#]*)', 1) AS _path0,
        regexp_extract(_tail, '\?([^#]*)', 1) AS _qs,
        CASE
            WHEN _scheme = 'http'  THEN regexp_replace(regexp_replace(_hostport, '\.+(:\d*)?$', '\1'), ':80$', '')
            WHEN _scheme = 'https' THEN regexp_replace(regexp_replace(_hostport, '\.+(:\d*)?$', '\1'), ':443$', '')
            ELSE regexp_replace(_hostport, '\.+(:\d*)?$', '\1')
        END AS _host
    FROM canon_parts
),
canon_norm AS (
    SELECT *,
        CASE WHEN _p1 = '' THEN '/'
             WHEN _p1 <> '/' THEN regexp_replace(_p1, '/$', '')
             ELSE _p1 END AS _path
    FROM (SELECT *, regexp_replace(_path0, '/{{2,}}', '/', 'g') AS _p1 FROM canon_pieces)
),
canon AS (
    SELECT *,
        _scheme || '://' || _host || _path ||
        CASE WHEN _qsn = '' THEN '' ELSE '?' || _qsn END AS canonical_url
    FROM (
        SELECT *, array_to_string(list_sort(list_filter(string_split(_qs, '&'),
            p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS _qsn
        FROM canon_norm
    )
)
"""


def duckdb_canonical_cte(source: str, url_expr: str) -> str:
    """DuckDB CTE chain mirroring :func:`canonicalize_url` step-for-step.

    Usage: ``f"WITH {duckdb_canonical_cte('frontier_view','url')} SELECT
    canonical_url ... FROM canon"``. Keeping the mirror next to the Spark
    implementation makes drift visible in review. Note DuckDB's
    ``regexp_replace`` needs the explicit 'g' flag where Spark always
    replaces globally (only the slash-collapse step is non-anchored here).
    """
    return DUCKDB_CANONICAL_CTE.format(source=source, url_expr=url_expr)


def url_hash(col: Column | str) -> Column:
    """xxhash64 of the canonical URL — the frontier/seen key (north rule)."""
    return F.xxhash64(_col(col))


def url_host(col: Column | str) -> Column:
    c = _col(col)
    return F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)", 1)
    )


def absolutize(url: Column | str, base: Column | str) -> Column:
    """F11 — relative href/src → absolute (reference: prefix join, e.g.
    /root/reference/app/scrapers/pchome.py:117-123)."""
    u, b = _col(url), _col(base)
    return (
        F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), u)
        .when(u.startswith("//"), F.concat(F.lit("https:"), u))
        .when(u.startswith("/"), F.concat(F.regexp_replace(b, r"(://[^/]+).*$", r"$1"), u))
        .otherwise(F.concat(F.regexp_replace(b, r"/[^/]*$", "/"), u))
    )


def extract_url_id(col: Column | str) -> Column:
    """F12 — sunfar.py:55-64 ``id=`` param extraction."""
    return F.regexp_extract(_col(col), r"id=([^&]+)", 1)
