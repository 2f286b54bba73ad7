"""RFC-3986 URL canonicalization + tracking-param strip.

The reference dedups on *raw* URL strings (Python set difference,
dags/crawler/seek_crawler.py:196). The north rule upgrades this to a
canonicalized URL-seen set; the canonicalizer is:

* scheme + host lowercased; default ports stripped (:80 http, :443 https);
* dot-segment removal per RFC 3986 §5.2.4;
* percent-encoding normalization: unreserved characters decoded,
  remaining escapes uppercased;
* tracking query params stripped (utm_*, gclid, fbclid, ...), other
  params kept in original order;
* fragment dropped; empty path → "/".

``canonicalize`` is a pure function (idempotent — property-tested);
``canonicalize_udf`` is its Arrow-batched wrapper. The same pure
function is used by the test simulator so engine and oracle agree.
"""

from __future__ import annotations

import pandas as pd
from urllib.parse import urlsplit, urlunsplit

TRACKING_PARAMS = frozenset(
    {
        "gclid",
        "fbclid",
        "msclkid",
        "mc_eid",
        "mc_cid",
        "igshid",
        "yclid",
        "dclid",
        "twclid",
        "ref_src",
        "spm",
        "_ga",
        "_gl",
    }
)
TRACKING_PREFIXES = ("utm_",)

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    """Decode %-escapes of unreserved chars; uppercase the rest."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hex2 = s[i + 1 : i + 3]
            try:
                ch = chr(int(hex2, 16))
            except ValueError:
                out.append(c)
                i += 1
                continue
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hex2.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
                if not output:
                    output = [""]
        else:
            output.append(seg)
    # preserve leading slash
    norm = "/".join(output)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _is_tracking(name: str) -> bool:
    lname = name.lower()
    return lname in TRACKING_PARAMS or lname.startswith(TRACKING_PREFIXES)


def canonicalize(url: str | None) -> str | None:
    if url is None:
        return None
    url = url.strip()
    if not url:
        return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None:
        port = str(parts.port)
        if _DEFAULT_PORTS.get(scheme) != port:
            netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _norm_pct(_remove_dot_segments(parts.path)) or "/"
    query = "&".join(
        _norm_pct(kv)
        for kv in parts.query.split("&")
        if kv and not _is_tracking(kv.split("=", 1)[0])
    )
    return urlunsplit((scheme, netloc, path, query, ""))


def path_after_host(url: str | None) -> str:
    """Everything after the (lowercased) host in the raw URL — the path
    string robots prefix rules are matched against. Shared by the engine
    UDF and the simulator so both sides agree byte-for-byte."""
    if not url:
        return "/"
    h = host_of(url)
    if h and h in url:
        return url.split(h, 1)[1] or "/"
    return "/"


def host_of(url: str | None) -> str:
    if not url:
        return ""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def canonicalize_batch(urls: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url_canon": urls.map(canonicalize),
            "host": urls.map(host_of),
            "path_q": urls.map(path_after_host),
        }
    )


def attach_canonical(df, url_col: str = "url"):
    """Adds url_canon + host + path_q columns in one Arrow UDF pass."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("url_canon", StringType()),
            StructField("host", StringType()),
            StructField("path_q", StringType()),
        ]
    )
    udf = F.pandas_udf(canonicalize_batch, schema)
    df = df.withColumn("_c", udf(F.col(url_col)))
    return (
        df.withColumn("url_canon", F.col("_c")["url_canon"])
        .withColumn("host", F.col("_c")["host"])
        .withColumn("path_q", F.col("_c")["path_q"])
        .drop("_c")
    )
