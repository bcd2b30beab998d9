"""User-agent parsing (L5 in SURVEY.md §2.9).

The reference wraps the ``user_agents`` Python library in a per-record
Lambda (enrichment/filters/user_agent.py:4-39) producing 12 device_*
fields; bots short-circuit to ``{device_is_bot: True}``.

Two implementations behind one interface:

- :func:`with_device_columns` — **native expression heuristic**
  (default): regexp family/version extraction for the major engines.
  Deterministic, zero Python workers, codegen-friendly — the 100 TB
  path.
- :func:`with_device_columns_pandas` — Arrow-batched pandas UDF
  wrapping ``user_agents`` when the library is installed (import-gated;
  raises ImportError otherwise). Byte-parity with the reference's
  enrichment Lambda when you need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOT_RE = r"(?i)(bot|crawler|spider|slurp|curl|wget|monitor|scanner)"

# (device_client_name, detection regex, version-extract regex) — first
# match wins; order matters (Edge/Opera embed "Chrome", Chrome embeds
# "Safari").
_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", r"(?:Opera|OPR/)", r"(?:Opera[ /]|OPR/)(\d+[\.\d]*)"),
    ("Samsung Internet", r"SamsungBrowser/", r"SamsungBrowser/(\d+[\.\d]*)"),
    ("Firefox", r"Firefox/", r"Firefox/(\d+[\.\d]*)"),
    ("Chrome", r"(?:Chrome|CriOS)/", r"(?:Chrome|CriOS)/(\d+[\.\d]*)"),
    ("Safari", r"Safari/", r"Version/(\d+[\.\d]*)"),
    ("IE", r"(?:MSIE |Trident/)", r"(?:MSIE |rv:)(\d+[\.\d]*)"),
]

_OSES = [
    ("Android", r"Android", r"Android (\d+[\.\d]*)"),
    ("iOS", r"(?:iPhone|iPad|iPod)", r"OS (\d+[_\d]*)"),
    ("Windows", r"Windows NT", r"Windows NT (\d+[\.\d]*)"),
    ("Mac OS X", r"Mac OS X", r"Mac OS X (\d+[_\.\d]*)"),
    ("Chrome OS", r"CrOS", r"CrOS [\w]+ (\d+[\.\d]*)"),
    ("Linux", r"Linux", r""),
]

NOT_SET = "(not set)"


# ua-parser's bot semantics: a row is a bot iff its DEVICE family
# resolves to "Spider" (crawler signatures), so CLI fetchers (curl,
# wget) and uptime monitors are NOT bots to the reference
# (enrichment/filters/user_agent.py:35-39 only short-circuits on
# user_agents' .is_bot, which wraps that device check). The native
# BOT_RE above deliberately widens this for training-data hygiene;
# UA_PARSER_BOT_RE reproduces the narrow reference policy.
UA_PARSER_BOT_RE = r"(?i)(bot|crawler|spider|slurp|scanner)"


def is_bot(ua: Column | str, ua_parser_policy: bool = False) -> Column:
    c = F.col(ua) if isinstance(ua, str) else ua
    return c.rlike(UA_PARSER_BOT_RE if ua_parser_policy else BOT_RE)


def _first_match(ua: Column, table: list[tuple[str, str, str]], name_default: str):
    name: Column | None = None
    version: Column | None = None
    for label, detect, ver_re in table:
        cond = ua.rlike(detect)
        ver = (
            F.nullif(F.regexp_extract(ua, ver_re, 1), F.lit(""))
            if ver_re
            else F.lit(None).cast("string")
        )
        if name is None:
            name = F.when(cond, F.lit(label))
            version = F.when(cond, ver)
        else:
            name = name.when(cond, F.lit(label))
            version = version.when(cond, ver)
    assert name is not None and version is not None
    return name.otherwise(F.lit(name_default)), version


def device_type(ua: Column) -> Column:
    is_tablet = ua.rlike(r"(?i)(iPad|Tablet|Kindle|Silk)") | (
        ua.contains("Android") & ~ua.contains("Mobile")
    )
    is_mobile = ua.rlike(r"(?i)(Mobile|iPhone|iPod|Windows Phone)") | (
        ua.contains("Android") & ua.contains("Mobile")
    )
    return (
        F.when(is_tablet, "tablet")
        .when(is_mobile, "mobile")
        .otherwise("desktop")
    )


def _ua_parser_family(ua: Column, browser: Column) -> Column:
    """Map the native engine family onto the ua-parser taxonomy the
    reference's ``user_agents`` lib emits (mobile splits, FxiOS,
    legacy AOSP, Amazon Silk, CLI clients) — closes divergences 1-2
    of the documented surface; version granularity (div. 3) and bot
    policy (div. 4) intentionally stay native."""
    return (
        F.when(ua.contains("FxiOS"), "Firefox iOS")
        .when(ua.contains("CriOS"), "Chrome Mobile iOS")
        .when(ua.rlike(r"Silk/"), "Amazon Silk")
        .when(ua.contains("python-requests"), "Python Requests")
        # CLI fetchers only surface a family under the ua-parser bot
        # policy (the native policy short-circuits them as bots)
        .when(ua.rlike(r"^curl/"), "curl")
        .when(ua.rlike(r"^Wget/"), "Wget")
        .when(
            (browser == "Chrome")
            & ua.contains("Android") & ua.contains("Mobile"),
            "Chrome Mobile",
        )
        .when(
            (browser == "Firefox")
            & (ua.contains("Android") | ua.contains("Mobile")),
            "Firefox Mobile",
        )
        .when(
            (browser == "Edge")
            & (ua.rlike(r"Edg(?:A|iOS)/") | ua.contains("Mobile")),
            "Edge Mobile",
        )
        .when((browser == "Opera") & ua.contains("Mobile"), "Opera Mobile")
        .when(
            (browser == "Safari")
            & ua.contains("Android") & ua.contains("Version/"),
            "Android",  # legacy AOSP browser
        )
        .when(
            (browser == "Safari") & ua.rlike(r"(?:iPhone|iPad|iPod)"),
            "Mobile Safari",
        )
        .otherwise(browser)
    )


def with_device_columns(
    df: DataFrame,
    ua_col: str = "user_agent",
    ua_parser_families: bool = False,
    ua_parser_bot_policy: bool = False,
) -> DataFrame:
    """Native-expression UA parse → the 12 ``device_*`` fields of the
    enriched-hit schema. Bots get only the bot flag (reference
    user_agent.py:35-39: bots short-circuit).

    ``ua_parser_families=True`` renames the client family into the
    reference's ua-parser taxonomy ("Mobile Safari", "Chrome Mobile",
    "Firefox iOS", "Android", "Amazon Silk", …) — still pure native
    expressions, raising measured exact-family agreement on the
    parity corpus from 17/29 to 27/29 (tests/test_ua_parity.py).
    ``ua_parser_bot_policy=True`` additionally narrows bot detection
    to ua-parser's Spider-only semantics (curl/wget/monitors are NOT
    bots to the reference), closing the last 2/29 — both flags
    together are measured 29/29 exact-family on the parity corpus.
    The defaults keep the engine-family taxonomy and the wider
    training-data-hygiene bot policy the existing marts and oracles
    pin."""
    ua = F.col(ua_col)
    bot = is_bot(ua, ua_parser_policy=ua_parser_bot_policy)
    browser, browser_ver = _first_match(ua, _BROWSERS, NOT_SET)
    if ua_parser_families:
        browser = _ua_parser_family(ua, browser)
    os_name, os_ver = _first_match(ua, _OSES, NOT_SET)
    dtype = device_type(ua)
    nb = lambda c: F.when(~bot, c)  # noqa: E731  null for bots
    return df.withColumns(
        {
            "device_is_bot": bot,
            "device_client_name": nb(browser),
            "device_client_version": nb(browser_ver),
            "device_os_name": nb(os_name),
            "device_os_version": nb(os_ver),
            "device_device_type": nb(dtype),
            "device_is_mobile": nb(dtype == "mobile"),
            "device_device_name": nb(
                F.when(ua.contains("iPhone"), "iPhone")
                .when(ua.contains("iPad"), "iPad")
                .otherwise(NOT_SET)
            ),
            "device_device_brand": nb(
                F.when(ua.rlike(r"(?:iPhone|iPad|Mac)"), "Apple")
                .when(ua.contains("Samsung"), "Samsung")
                .otherwise(NOT_SET)
            ),
            "device_device_model": nb(F.lit(NOT_SET)),
            "device_device_input": nb(
                F.when(dtype.isin("mobile", "tablet"), "touchscreen").otherwise(
                    NOT_SET
                )
            ),
            "device_device_info": nb(F.lit(NOT_SET)),
        }
    )


def with_device_columns_pandas(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    """Arrow-batched pandas-UDF UA parse via the ``user_agents`` library
    (exact reference semantics, enrichment/filters/user_agent.py:14-32).
    Import-gated: raises ImportError when the library is absent."""
    import user_agents  # noqa: F401  (gate: not installed in this env)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    schema = (
        "client_name string, client_version string, os_name string, "
        "os_version string, device_type string, is_mobile boolean, "
        "is_bot boolean, device_name string, device_brand string, "
        "device_model string"
    )

    @pandas_udf(schema)
    def parse(uas: pd.Series) -> pd.DataFrame:
        import user_agents as ua_lib

        rows = []
        for s in uas.fillna(""):
            u = ua_lib.parse(s)
            rows.append(
                {
                    "client_name": u.browser.family,
                    "client_version": u.browser.version_string,
                    "os_name": u.os.family,
                    "os_version": u.os.version_string,
                    "device_type": (
                        "mobile"
                        if u.is_mobile
                        else "tablet"
                        if u.is_tablet
                        else "desktop"
                    ),
                    "is_mobile": u.is_mobile,
                    "is_bot": u.is_bot,
                    "device_name": u.device.family,
                    "device_brand": u.device.brand or NOT_SET,
                    "device_model": u.device.model or NOT_SET,
                }
            )
        return pd.DataFrame(rows)

    return (
        df.withColumn("_ua", parse(F.col(ua_col)))
        .withColumns(
            {
                "device_is_bot": F.col("_ua.is_bot"),
                "device_client_name": F.col("_ua.client_name"),
                "device_client_version": F.col("_ua.client_version"),
                "device_os_name": F.col("_ua.os_name"),
                "device_os_version": F.col("_ua.os_version"),
                "device_device_type": F.col("_ua.device_type"),
                "device_is_mobile": F.col("_ua.is_mobile"),
                "device_device_name": F.col("_ua.device_name"),
                "device_device_brand": F.col("_ua.device_brand"),
                "device_device_model": F.col("_ua.device_model"),
            }
        )
        .drop("_ua")
    )
