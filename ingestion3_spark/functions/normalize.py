"""String-normalization kernels — vectorized re-expressions of the
reference's per-record normalizers (``enrichments/normalizations/
StringNormalizationUtils.scala``, applied field-by-field in
``StringNormalizations.scala:17-144``). Each is a pure Column expression
(whole-stage codegen); unit tests mirror the reference's input→expected
pairs (``StringNormalizationUtilsTest.scala``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def reduce_whitespace(col) -> Column:
    """Collapse runs of whitespace (incl. NBSP) to one space, trim
    (StringNormalizationUtils.scala:154-155)."""
    return F.trim(F.regexp_replace(_c(col), r"[\s ]+", " "))


def strip_html(col) -> Column:
    """Unescape entities then remove tags (approximation of the jsoup
    clean, :199-208; exact DOM parity needs an html parser UDF)."""
    no_tags = F.regexp_replace(_c(col), r"<[^>]*>", " ")
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(no_tags, "&amp;", "&"), "&lt;", "<"
            ),
            "&gt;", ">",
        ),
        "&quot;", '"',
    )
    return reduce_whitespace(unescaped)


def cleanup_leading_punctuation(col) -> Column:
    """Strip [-;:,\\/\\s] before the first alphanumeric (:72-84)."""
    return F.regexp_replace(_c(col), r"^[-;:,\\/\s]+", "")


def cleanup_ending_punctuation(col) -> Column:
    """Strip [-;:,\\/\\s] after the last alphanumeric (:105-114)."""
    return F.regexp_replace(_c(col), r"[-;:,\\/\s]+$", "")


def cleanup_ending_comma_and_space(col) -> Column:
    """Strip trailing commas/whitespace (:88-99)."""
    return F.regexp_replace(_c(col), r"[,\s]+$", "")


def strip_ending_period(col) -> Column:
    """Remove a single trailing '.' but not '..' / '...' (:213-217)."""
    return F.regexp_replace(_c(col), r"(?<!\.)\.\s*$", "")


def capitalize_first_char(col) -> Column:
    """Uppercase the FIRST alphabetic char only, preserving any prefix
    (:56-66). F.initcap is wrong (it capitalizes every word)."""
    c = _c(col)
    prefix = F.regexp_extract(c, r"^([^A-Za-z]*)", 1)
    first = F.upper(F.regexp_extract(c, r"^[^A-Za-z]*([A-Za-z])", 1))
    rest = F.regexp_replace(c, r"^[^A-Za-z]*[A-Za-z]", "")
    return F.when(first == "", c).otherwise(F.concat(prefix, first, rest))


def limit_characters(col, n: int) -> Column:
    """Truncate to n characters (:141-144)."""
    return F.substring(_c(col), 1, n)


def strip_dbl_quotes(col) -> Column:
    """Remove all double quotes (:196-197)."""
    return F.translate(_c(col), '"', "")


def strip_unmatched_opening_brackets(col) -> Column:
    """Remove a leading '[' when no ']' follows (:183-192)."""
    c = _c(col)
    return F.when(
        c.startswith("[") & ~c.contains("]"),
        F.substring(c, F.lit(2), F.length(c)),
    ).otherwise(c)


def strip_unmatched_closing_brackets(col) -> Column:
    c = _c(col)
    return F.when(
        c.endswith("]") & ~c.contains("["),
        F.substring(c, F.lit(1), F.length(c) - 1),
    ).otherwise(c)


def cleanup_geocoordinates(col) -> Column:
    """'35.58N, 83.50W' -> '35.58, 83.50'; anything else -> '' (:157-172)."""
    c = _c(col)
    lat = F.regexp_extract(c, r"^(-?\d+\.?\d*)[NS]?,?\s*(-?\d+\.?\d*)[EW]?$", 1)
    lon = F.regexp_extract(c, r"^(-?\d+\.?\d*)[NS]?,?\s*(-?\d+\.?\d*)[EW]?$", 2)
    return F.when((lat != "") & (lon != ""), F.concat(lat, F.lit(", "), lon)).otherwise(F.lit(""))


def split_at_delimiter(col, delim: str = ";") -> Column:
    """Split + trim + drop empties (:176-178). Returns array<string>."""
    return F.filter(
        F.transform(F.split(_c(col), delim), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def convert_to_sentence_case(col) -> Column:
    """Capitalize each '.'-separated sentence (:122-129).

    Expression-only via split/transform; mirrors the reference's
    WordUtils-based behavior for the common case."""
    sentences = F.split(_c(col), r"\.\s*")
    fixed = F.transform(
        sentences,
        lambda s: F.when(
            F.length(s) > 0,
            F.concat(
                F.upper(F.substring(s, F.lit(1), F.lit(1))),
                F.substring(s, F.lit(2), F.length(s)),
            ),
        ).otherwise(s),
    )
    return F.array_join(F.filter(fixed, lambda s: s != ""), ". ")


# ------------------------------------------------------- edmRights-style URI
def normalize_rights_uri(col) -> Column:
    """Chained URI rewrites (mappers/Mapper.scala:59-174): https->http,
    drop www, /page/->/vocab/, drop /rdf, drop query string, strip trailing
    punctuation, ensure trailing slash."""
    c = _c(col)
    c = F.regexp_replace(c, r"^https://", "http://")
    c = F.regexp_replace(c, r"^http://www\.", "http://")
    c = F.regexp_replace(c, r"/page/", "/vocab/")
    c = F.regexp_replace(c, r"/rdf/?$", "/")
    c = F.regexp_replace(c, r"\?.*$", "")
    c = F.regexp_replace(c, r"[\.,;:\s]+$", "")
    c = F.when(c.rlike("/$"), c).otherwise(F.concat(c, F.lit("/")))
    return c


# --------------------------------------------------------------- date ranges
def date_begin_end(col) -> Column:
    """DateBuilder.generateBeginEnd analog (enrichments/date/DateBuilder.
    scala:16-55) plus the common ParseDateEnrichment patterns
    (enrichments/ParseDateEnrichment.scala:14-101): returns
    struct<begin:string, end:string> (nulls when unparseable).

    Patterns: 'YYYY'; 'YYYY-YYYY' / 'YYYY - YYYY'; 'YYYYs' decades;
    'circa YYYY'/'c. YYYY'; 'YYYY-MM'; 'YYYY-MM-DD'.
    """
    c = F.trim(_c(col))
    y = r"(\d{4})"
    single = F.regexp_extract(c, rf"^{y}$", 1)
    r_lo = F.regexp_extract(c, rf"^{y}\s*-\s*{y}$", 1)
    r_hi = F.regexp_extract(c, rf"^{y}\s*-\s*{y}$", 2)
    decade = F.regexp_extract(c, rf"^{y}0?s$", 0)
    decade_base = F.regexp_extract(c, r"^(\d{3})0s$", 1)
    circa = F.regexp_extract(c, rf"^(?:circa|ca?\.)\s*{y}$", 1)
    ym = F.regexp_extract(c, rf"^{y}-(\d{{2}})$", 0)
    ymd = F.regexp_extract(c, rf"^{y}-(\d{{2}})-(\d{{2}})$", 0)

    return (
        F.when(single != "", F.struct(single.alias("begin"), single.alias("end")))
        .when((r_lo != "") & (r_hi != ""), F.struct(r_lo.alias("begin"), r_hi.alias("end")))
        .when(
            decade_base != "",
            F.struct(
                F.concat(decade_base, F.lit("0")).alias("begin"),
                F.concat(decade_base, F.lit("9")).alias("end"),
            ),
        )
        .when(circa != "", F.struct(circa.alias("begin"), circa.alias("end")))
        .when(ymd != "", F.struct(ymd.alias("begin"), ymd.alias("end")))
        .when(ym != "", F.struct(ym.alias("begin"), ym.alias("end")))
        .otherwise(
            F.struct(
                F.lit(None).cast("string").alias("begin"),
                F.lit(None).cast("string").alias("end"),
            )
        )
    )


# ------------------------------------------- per-field multi-valued dedup (A10)
def dedupe_record_fields(
    df,
    array_cols: tuple[str, ...] | list[str],
    message_col: str | None = "messages",
    id_col: str = "doc_id",
):
    """In-record dedup of multi-valued fields (SURVEY.md §2 A10): apply a
    first-occurrence-order ``array_distinct`` to each named array column —
    the vectorized form of the reference's per-field ``Seq.distinct`` pass
    (``enrichments/normalizations/Deduplication.scala:16-75``, run as the
    first enrichment in ``EnrichmentDriver.scala:57-65``).

    When ``message_col`` is set (and present in ``df``), every actually-
    changed field appends an info message recording the shrink — the
    reference's "normalize + record what changed" contract. Token-sequence
    payloads (``tokens``) must NOT be passed here: a token array is an
    ordered sequence, not a value set.
    """
    out = df
    have_msgs = message_col is not None and message_col in df.columns
    for c in array_cols:
        deduped = F.array_distinct(F.col(c))
        if have_msgs:
            changed = F.size(deduped) < F.size(F.col(c))
            info = F.struct(
                F.lit("duplicate values removed").alias("message"),
                F.lit("info").alias("level"),
                F.col(id_col).cast("string").alias("id"),
                F.lit(c).alias("field"),
                F.size(F.col(c)).cast("string").alias("value"),
                F.size(deduped).cast("string").alias("enrichedValue"),
            )
            out = out.withColumn(
                message_col,
                F.when(changed, F.array_append(F.col(message_col), info)).otherwise(
                    F.col(message_col)
                ),
            )
        out = out.withColumn(c, deduped)
    return out


def array_distinct_ordered(col) -> Column:
    """First-occurrence-order distinct for one array column (the kernel
    inside :func:`dedupe_record_fields`; Spark's ``array_distinct``
    preserves first-occurrence order like Scala ``Seq.distinct``)."""
    return F.array_distinct(_c(col))


# ------------------------------------------------- allow/block term filters
def apply_allow_filter(arr_col, allow_regexes: list[str]) -> Column:
    """Keep array terms matching ANY allow regex (StringNormalizationUtils.
    scala:34-48, extent extraction). Case-insensitive, expression-only."""
    pat = "(?i)" + "|".join(f"(?:{r})" for r in allow_regexes)
    return F.filter(_c(arr_col), lambda s: s.rlike(pat))


def apply_block_filter(arr_col, block_regexes: list[str]) -> Column:
    """Drop array terms matching ANY block regex (:132-137)."""
    pat = "(?i)" + "|".join(f"(?:{r})" for r in block_regexes)
    return F.filter(_c(arr_col), lambda s: ~s.rlike(pat))


# ----------------------------------------------------------- URI validation
_IPV4 = r"(?:\d{1,3}\.){3}\d{1,3}"

def uri_is_valid(col) -> Column:
    """Parseable absolute http(s) URI (model/DplaMapData.scala:140-151
    ``validate``): scheme + non-empty host, no whitespace."""
    return _c(col).rlike(r"^https?://[^\s/?#]+\S*$")


def has_bare_ip_host(col) -> Column:
    """Host is an IPv4 or [IPv6] literal (model/DplaMapData.scala:153-164
    ``hasBareIpHost`` — routed as an error message in validateIsShownAt)."""
    c = _c(col)
    return c.rlike(rf"^https?://{_IPV4}(?::\d+)?(?:[/?#]|$)") | c.rlike(
        r"^https?://\[[0-9A-Fa-f:]+\](?::\d+)?(?:[/?#]|$)"
    )


RIGHTS_URI_DOMAINS = ("rightsstatements.org", "creativecommons.org")

# Exact-membership vocabulary (the mechanism of ``isValidEdmRightsUri``'s
# ~590-entry static set, model/DplaMapData.scala:175-768). This bundles the
# publicly-documented rightsstatements.org statements + common Creative
# Commons stems; deployments load their full list via load_rights_uris().
RIGHTS_URIS_BUNDLED = tuple(
    f"http://rightsstatements.org/vocab/{slug}/1.0/"
    for slug in (
        "InC", "InC-OW-EU", "InC-EDU", "InC-NC", "InC-RUU",
        "NoC-CR", "NoC-NC", "NoC-OKLR", "NoC-US",
        "CNE", "UND", "NKC",
    )
) + tuple(
    f"http://creativecommons.org/licenses/{slug}/{ver}/"
    for slug in ("by", "by-sa", "by-nd", "by-nc", "by-nc-sa", "by-nc-nd")
    for ver in ("1.0", "2.0", "2.5", "3.0", "4.0")
) + (
    "http://creativecommons.org/publicdomain/zero/1.0/",
    "http://creativecommons.org/publicdomain/mark/1.0/",
)


def load_rights_uris(path: str) -> tuple[str, ...]:
    """Load a full rights vocabulary (one URI per line, # comments)."""
    with open(path) as f:
        return tuple(
            ln.strip() for ln in f if ln.strip() and not ln.startswith("#")
        )


def is_rights_uri_exact(col, uris: tuple[str, ...] | None = None) -> Column:
    """EXACT membership against the rights vocabulary — a broadcast
    ``isin`` (Catalyst compiles the static list to an InSet hash probe, the
    distributed form of the reference's ``Set.contains``). Unlike
    :func:`is_recognized_rights_uri`'s shape regex, this is the
    byte-exact check the reference performs."""
    return _c(col).isin(*(uris or RIGHTS_URIS_BUNDLED))

def is_recognized_rights_uri(col) -> Column:
    """Membership check against the rights vocabularies (the mechanism of
    ``isValidEdmRightsUri``'s ~590-entry static set, model/DplaMapData.
    scala:175-768, re-expressed as domain+path shape; at scale an exact
    list becomes a broadcast ``isin``/join)."""
    c = _c(col)
    return c.rlike(
        r"^http://rightsstatements\.org/vocab/[A-Za-z\-]+/\d+(\.\d+)*/$"
    ) | c.rlike(
        r"^http://creativecommons\.org/(licenses|publicdomain)/[a-z\-]+(/\d+(\.\d+)*)?/$"
    )


# ------------------------------------------------------------- EDTF extras
# date-part pattern family mirroring EDTFDate.scala:7-17: a year with an
# optional month(-day) or season (21-24); qualifiers [?~]+ allowed and
# stripped; "unknown" interval endpoints become empty strings.
_EDTF_YMDS = r"\d{4}(?:-(?:0[1-9]|1[0-2])(?:-(?:0[1-9]|[12][0-9]|3[01]))?|-2[1-4])?"
_Q = r"[?~]*"


def _edtf_clean(part: Column) -> Column:
    """EDTFDate.scala ``clean``: drop 'unknown', strip a season suffix."""
    c = F.regexp_replace(part, r"^unknown$", "")
    return F.regexp_replace(c, r"^(\d{4})-2[1-4]$", r"$1")


def edtf_begin_end(col) -> Column:
    """EDTF level-1/2 forms beyond date_begin_end (utils/EDTFDate.scala:
    115-218, enrichments/ParseDateEnrichment.scala:14-101):

    - uncertainty/approximation '1984?' / '1984~' / '1984?~' (qualifiers
      stripped, any date form);
    - seasons '1984-21'..'1984-24' -> the bare year (clean's strip-season);
    - unspecified digits '198u' / '19uu' / 'YYYY-MM-uu' (month range) /
      'YYYY-uu-uu' (Jan 1 - Dec 31); 'YYYY-uu' matches but yields the
      reference's empty-string range;
    - intervals 'A/B' where each side is any date form, optionally
      qualified ('1984?/1986~') or 'unknown' (empty string endpoint);
    - open intervals 'A/open' -> (A, '');
    - timestamps 'YYYY-MM-DDThh:mm:ss[Z|±hh:mm]' -> date part only.

    Returns struct<begin:string, end:string> (null-null when unparseable
    here — callers coalesce with date_begin_end; empty string = the
    reference's 'matched but unbounded/unspecified' marker)."""
    c = F.trim(_c(col))

    def s(b, e):
        return F.struct(b.alias("begin"), e.alias("end"))

    null_s = F.lit(None).cast("string")
    empty = F.lit("")

    # exact date (incl. season), optional qualifiers
    exact = F.regexp_extract(c, rf"^({_EDTF_YMDS}){_Q}$", 1)
    exact_clean = _edtf_clean(exact)
    # unspecified-digit family (dateRegex branch -> rangeForUnspecDate)
    dec_u = F.regexp_extract(c, rf"^(\d{{3}})u{_Q}$", 1)
    cen_u = F.regexp_extract(c, rf"^(\d{{2}})uu{_Q}$", 1)
    ym_u = F.regexp_extract(c, rf"^(\d{{4}}-\d{{2}})-uu{_Q}$", 1)
    y_uu_uu = F.regexp_extract(c, rf"^(\d{{4}})-uu-uu{_Q}$", 1)
    y_uu = F.regexp_extract(c, rf"^(\d{{4}})-uu{_Q}$", 1)
    # timestamp (dateAndTimeRegex)
    ts = F.regexp_extract(
        c, r"^(\d{4}-\d{2}-\d{2})T\d{2}:\d{2}:\d{2}(?:Z|[\+\-]\d{2}:\d{2})?$", 1
    )
    # qualified interval, each side a date form or 'unknown'
    side = rf"((?:{_EDTF_YMDS})|unknown)"
    iv = rf"^{side}{_Q}/{side}{_Q}$"
    iv_lo, iv_hi = F.regexp_extract(c, iv, 1), F.regexp_extract(c, iv, 2)
    # open interval
    open_lo = F.regexp_extract(c, rf"^({_EDTF_YMDS}){_Q}/open$", 1)

    return (
        F.when(dec_u != "", s(F.concat(dec_u, F.lit("0")), F.concat(dec_u, F.lit("9"))))
        .when(cen_u != "", s(F.concat(cen_u, F.lit("00")), F.concat(cen_u, F.lit("99"))))
        .when(ym_u != "", s(ym_u, ym_u))
        .when(
            y_uu_uu != "",
            s(F.concat(y_uu_uu, F.lit("-01-01")), F.concat(y_uu_uu, F.lit("-12-31"))),
        )
        .when(y_uu != "", s(empty, empty))
        .when(exact != "", s(exact_clean, exact_clean))
        .when(ts != "", s(ts, ts))
        .when(
            (iv_lo != "") | (iv_hi != ""),
            s(_edtf_clean(iv_lo), _edtf_clean(iv_hi)),
        )
        .when(open_lo != "", s(_edtf_clean(open_lo), empty))
        .otherwise(s(null_s, null_s))
    )
