"""IP anonymization (L2 in SURVEY.md §2.9) as a native expression.

Reference (functions/transformation/main.py:27-39): IPv4 → zero the
last octet; IPv6 → keep first 3 hextets, pad five ``0000`` groups;
anything else → ``0.0.0.0``.

Reference's own test vectors (transformation/main.py:129-133):
``255.255.255.255 → 255.255.255.0``;
``ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff →
ffff:ffff:ffff:0000:0000:0000:0000:0000``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def anonymize_ip(ip: Column | str) -> Column:
    c = F.col(ip) if isinstance(ip, str) else ip
    v4 = F.split(c, r"\.")
    v6 = F.split(c, ":")
    return (
        F.when(
            F.size(v4) == 4,
            F.concat_ws(".", F.slice(v4, 1, 3), F.lit("0")),
        )
        .when(
            F.size(v6) >= 3,
            F.concat_ws(
                ":",
                F.slice(v6, 1, 3),
                F.lit("0000"), F.lit("0000"), F.lit("0000"),
                F.lit("0000"), F.lit("0000"),
            ),
        )
        .otherwise(F.lit("0.0.0.0"))
    )
