"""URL canonicalization — the Common-Crawl dedup-key primitive.

Two crawls of the same page differ in scheme/host case, default ports,
fragments, and tracking parameters; exact dedup and the pages table's
``bucket(url)`` layout both want ONE canonical form per page. Rules
(each a pure column expression — JVM codegen, no Python):

  1. strip the ``#fragment``;
  2. lowercase the scheme and the host[:port] authority (path/query keep
     their case — paths are case-sensitive);
  3. drop the scheme's default port (``http://x:80`` -> ``http://x``,
     ``https://x:443`` -> ``https://x``);
  4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``), preserving the remaining params' order; drop the
     ``?`` when the query empties;
  5. collapse a bare trailing ``?``.

Every rule is expressible in ANSI-ish SQL (higher-order list functions),
so the driver gate has a closed-form DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = "^(utm_|fbclid=|gclid=|msclkid=)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules. Total: non-URL-ish
    strings pass through (minus fragment/tracking-param handling) rather
    than erroring — crawl data is dirty."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    # split once: authority = up to first '/' or '?' after scheme://
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(authority) + F.lit(1), F.lit(1 << 30))
    auth_lc = F.lower(authority)
    auth_np = F.when(
        (F.lower(scheme) == "http") & auth_lc.endswith(":80"),
        F.regexp_replace(auth_lc, ":80$", ""),
    ).when(
        (F.lower(scheme) == "https") & auth_lc.endswith(":443"),
        F.regexp_replace(auth_lc, ":443$", ""),
    ).otherwise(auth_lc)

    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(
        F.length(tail) > F.length(path),
        F.substring(tail, F.length(path) + F.lit(2), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING),
    )
    new_query = F.array_join(kept, "&")
    rebuilt_tail = F.concat(
        path, F.when(F.length(new_query) > 0, F.concat(F.lit("?"), new_query)).otherwise(F.lit(""))
    )
    canon = F.when(
        F.length(scheme) > 0,
        F.concat(F.lower(scheme), F.lit("://"), auth_np, rebuilt_tail),
    ).otherwise(
        # no scheme: still strip fragment + tracking params on the tail
        F.concat(
            F.regexp_extract(u, r"^([^?]*)", 1),
            F.when(
                F.length(new_query) > 0, F.concat(F.lit("?"), new_query)
            ).otherwise(F.lit("")),
        )
    )
    return canon
