"""Composite driver-window queries + the multimodal driver query.

The driver's CORRECTNESS check covers the first 50 registered queries;
these composites pack whole function FAMILIES (SURVEY.md B13–B15 +
conditional + error-safe casts; C4 quality/lang-id/fingerprints) into
one slot each so every operator class fits inside the window. The
single-family showcases they subsume stay registered (after the window)
and stay green in the pytest oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import text as X
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "scalar_funcs_composite",
    oracle="""
    SELECT o_orderkey,
           lower(o_orderpriority) AS prio_lc,
           substring(o_orderpriority, 1, 1) AS prio_digit,
           length(o_orderpriority) AS prio_len,
           concat(o_orderstatus, ':', o_orderpriority) AS status_prio,
           (o_orderpriority LIKE '1%') AS is_p1,
           regexp_extract(o_orderpriority, '([A-Z]+)', 1) AS prio_word,
           replace(o_orderpriority, 'URGENT', 'URG') AS prio_short,
           round(o_totalprice, 1) AS price_r1,
           abs(o_totalprice - 100000.0) AS price_dev,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           sqrt(o_totalprice) AS price_sqrt,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 7 AS DOUBLE) AS price_mod7,
           CAST(sign(o_totalprice - 150000.0) AS INTEGER) AS price_sign,
           year(o_orderdate) AS order_year,
           quarter(o_orderdate) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           LEAST(o_totalprice, 250000.0) AS capped_price,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
           TRY_CAST('2024-13-45' AS DATE) AS bad_date
    FROM orders
    """,
)
def scalar_funcs_composite(spark, sf_dir):
    """One-slot composite of the scalar-function families (B13 string,
    B14 date, B15 math, conditional, error-safe cast) — every expression
    mirrors a member of the dedicated showcases (``string_funcs_*``,
    ``date_funcs_orders``, ``math_funcs_lineitem``, ``conditional_funcs``,
    ``safe_cast_funcs``), which remain registered and pytest-gated."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("prio_lc"),
        F.substring("o_orderpriority", 1, 1).alias("prio_digit"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.col("o_orderpriority").like("1%").alias("is_p1"),
        F.regexp_extract("o_orderpriority", "([A-Z]+)", 1).alias("prio_word"),
        F.replace(F.col("o_orderpriority"), F.lit("URGENT"), F.lit("URG")).alias("prio_short"),
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dev"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_totalprice").cast("decimal(18,2)") % 7).cast("double").alias("price_mod7"),
        F.signum(F.col("o_totalprice") - 150000.0).cast("int").alias("price_sign"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")).alias(
            "days_since_95"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.least("o_totalprice", F.lit(250000.0)).alias("capped_price"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS int)").alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS int)").alias("status_num"),
        F.expr("try_cast('2024-13-45' AS date)").alias("bad_date"),
    )


def _text_composite_oracle() -> str:
    """Quality + fingerprint + lang-id columns in one pass over documents
    — lang-id oracle generated from the SAME marker table as the Spark
    operator (see tierc._lang_id_oracle), so they cannot drift."""
    structs = []
    for i, (lang, words) in enumerate(sorted(X._LANG_MARKERS.items())):
        if not words:
            continue
        pat = " (" + "|".join(words) + ") "
        structs.append(
            f"{{'score': len(regexp_extract_all(' ' || lower(text) || ' ', '{pat}')), "
            f"'nb': {-i}, 'lang': '{lang}'}}"
        )
    arr = "[" + ", ".join(structs) + "]"
    return f"""
    SELECT doc_id, lang,
           length(text) AS q_chars,
           len(regexp_extract_all(text, '\\w+')) AS q_words,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS q_tokens,
           CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / greatest(length(text), 1) AS q_punct_ratio,
           CAST(len(regexp_extract_all(' ' || lower(text) || ' ', ' (the|and|of|to|is|a|in) ')) AS DOUBLE)
             / greatest(len(regexp_extract_all(text, '\\w+')), 1) AS q_stopword_ratio,
           md5(lower(trim(text))) AS fp_md5,
           sha256(lower(trim(text))) AS fp_sha256,
           md5(substring(lower(trim(text)), 1, 128)) AS fp_prefix128,
           CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
                WHEN best.score > 0 THEN best.lang
                ELSE 'und' END AS pred_lang
    FROM (SELECT doc_id, lang, text, list_reverse_sort({arr})[1] AS best FROM documents)
    """


@register("text_analysis_composite", oracle=_text_composite_oracle())
def text_analysis_composite(spark, sf_dir):
    """One-slot C4 composite: quality metrics + content fingerprints +
    language ID, chained through the same ``operators.text`` functions
    the dedicated showcases use — one scan, all JVM regexp/digest
    built-ins, zero Python in the row path."""
    d = _t(spark, sf_dir, "documents")
    out = X.lang_id(X.fingerprint(X.quality_stats(d)))
    return out.select(
        "doc_id", "lang",
        "q_chars", "q_words", "q_tokens", "q_punct_ratio", "q_stopword_ratio",
        "fp_md5", "fp_sha256", "fp_prefix128",
        "pred_lang",
    )


@register(
    "skew_salted_agg_events",
    oracle="""
    SELECT CASE WHEN user_id % 100 < 50 THEN 0 ELSE user_id END AS k,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def skew_salted_agg_events(spark, sf_dir):
    """Skew-safe two-phase aggregation on a deliberately skewed key:
    half of all events collapse onto the hot key 0 (a bot-user shape —
    at 100 TB a plain groupBy pins one reducer with ~50% of the table).
    ``salted_agg`` spreads the hot key over the salt range in phase 1;
    the plan gate (test_plans.py) asserts the pre-shuffle partitioning
    really includes ``__salt``. Results identical to the direct groupBy
    (decimal partials ⇒ exact), checked by the plain-SQL oracle."""
    from postgre_to_clickhouse_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(F.col("user_id") % 100 < 50, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.col("value").cast("decimal(18,6)").alias("__vdec"),
    )
    out = salted_agg(
        skewed,
        keys=["k"],
        aggs={"n_events": ("__vdec", "count"), "sum_value": ("__vdec", "sum")},
        n_salts=16,
    )
    return out.select("k", "n_events", F.col("sum_value").cast("double").alias("sum_value"))


@register(
    "multimodal_image_stats",
    oracle="""
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 3 = 2 THEN 16 ELSE 8 END AS width,
           CASE WHEN d.doc_id % 3 = 2 THEN 16 ELSE 8 END AS height,
           CASE d.doc_id % 3 WHEN 0 THEN 246 WHEN 1 THEN 268 ELSE 336 END
             AS payload_bytes,
           CAST(CASE WHEN d.doc_id % 3 = 2
                THEN 768 * (160 + (d.doc_id * 7) % 32) + 4608
                ELSE SUM((d.doc_id * 7 + t.i) % 256) END AS BIGINT) AS pixel_sum,
           CAST(CASE WHEN d.doc_id % 3 = 2
                THEN 160 + (d.doc_id * 7) % 32
                ELSE MIN(CASE WHEN t.i = 0 THEN (d.doc_id * 7 + t.i) % 256 END)
                END AS INTEGER) AS corner_tl,
           CAST(CASE WHEN d.doc_id % 3 = 2
                THEN 172 + (d.doc_id * 7) % 32
                ELSE MIN(CASE WHEN t.i = 191 THEN (d.doc_id * 7 + t.i) % 256 END)
                END AS INTEGER) AS corner_br
    FROM documents d, range(192) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_image_stats(spark, sf_dir):
    """C5 end-to-end on REAL bytes, THREE container formats in one
    table: ids ≡0 (mod 3) encode as BMP and ≡1 as PNG (8×8 gradient,
    pixel[i] = (doc_id*7 + i) mod 256 — closed form, so plain SQL
    recomputes every stat; stored-deflate keeps PNG at 268 bytes vs
    BMP's 246), and ≡2 as REAL baseline JPEG (r6 — the dependency-free
    T.81 decoder in operators/jpeg.py): a 16×16 grayscale image of four
    constant 8×8 blocks ``v + 8*(y//8) + 4*(x//8)``, v = 160+(id*7)%32,
    which survives the all-8 quantization EXACTLY (DC-only blocks,
    power-of-two IDCT scales), so pixel_sum = 768v+4608 and the corners
    are v and v+12 in closed form; the 336-byte payload constant is
    asserted across the whole v-domain in tests. Corner stats are
    position-sensitive (row-order/channel-order/DC-prediction bugs flip
    them) and ``payload_bytes`` pins the container per row. Both
    mapInPandas stages are Arrow-batched; payload bytes never leave the
    executors (only the compact stats row comes back)."""
    from postgre_to_clickhouse_spark.operators.multimodal import image_stats, media_from_ids

    d = _t(spark, sf_dir, "documents").select("doc_id")
    media = media_from_ids(d, id_col="doc_id", height=8, width=8, fmt="mix3")
    return image_stats(media, id_col="doc_id")


@register(
    "multimodal_audio_stats",
    oracle="""
    SELECT d.doc_id,
           256 AS n_samples,
           16000 AS sample_rate,
           556 AS payload_bytes,
           CAST(SUM(((d.doc_id * 13 + t.i * 7) % 65536) - 32768) AS BIGINT) AS sample_sum,
           CAST(MIN(CASE WHEN t.i = 0 THEN ((d.doc_id * 13 + t.i * 7) % 65536) - 32768 END) AS INTEGER) AS first_sample,
           CAST(MIN(CASE WHEN t.i = 255 THEN ((d.doc_id * 13 + t.i * 7) % 65536) - 32768 END) AS INTEGER) AS last_sample
    FROM documents d, range(256) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_audio_stats(spark, sf_dir):
    """C5 audio path end-to-end on REAL bytes: synthesize mono PCM16
    per document (sample[i] = ((doc_id*13 + 7i) mod 65536) − 32768 —
    closed form), encode with the dependency-free RIFF/WAVE codec,
    decode it back, and emit integer-exact stats. ``first_sample``/
    ``last_sample`` are position-sensitive: an endianness or
    header-offset decode bug flips them, which the oracle catches.
    Arrow-batched both ways; payloads never leave the executors."""
    from postgre_to_clickhouse_spark.operators.multimodal import audio_from_ids, audio_stats

    d = _t(spark, sf_dir, "documents").select("doc_id")
    media = audio_from_ids(d, id_col="doc_id", n_samples=256, sample_rate=16000)
    return audio_stats(media, id_col="doc_id")


@register(
    "url_ip_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || lang || '.' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&ref='
               || CAST(doc_id % 7 AS VARCHAR) AS url,
             CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS ip_num
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/?]+)', 1) AS host,
           regexp_extract(regexp_extract(url, 'https://([^/?]+)', 1),
                          '([^.]+)$', 1) AS tld,
           regexp_extract(regexp_extract(url, 'https://([^/?]+)', 1),
                          '([^.]+\\.[^.]+)$', 1) AS first_sig_domain,
           regexp_extract(url, 'https://[^/?]+(/[^?]*)', 1) AS url_path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang,
           CAST(ip_num // 16777216 AS VARCHAR) || '.'
             || CAST((ip_num // 65536) % 256 AS VARCHAR) || '.'
             || CAST((ip_num // 256) % 256 AS VARCHAR) || '.'
             || CAST(ip_num % 256 AS VARCHAR) AS ip_str,
           ip_num AS ip_roundtrip
    FROM u
    """,
)
def url_ip_funcs(spark, sf_dir):
    """r7, B25: ClickHouse URL/IP function-family parity — ``domain``,
    ``topLevelDomain``, ``cutToFirstSignificantSubdomain``, ``path``,
    ``extractURLParameter``, ``IPv4NumToString``/``IPv4StringToNum`` —
    over URLs synthesized deterministically from fixture columns (the
    fixtures carry no URL column; the functions, not the data, are
    under test). Spark mapping: ``parse_url(HOST/PATH/QUERY)`` +
    ``substring_index`` for the domain family; pure integer bit
    arithmetic for the IPv4 round-trip (``ip_roundtrip`` re-packs the
    four octets — any endianness/octet-order bug breaks equality with
    the untouched ``ip_num``). All string/integer exact; the oracle
    recomputes with regexes, a structurally different parser. Map-only
    scan stage — every function fuses into codegen."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("lang"), F.lit("."), F.col("source"),
        F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
        F.lit("?lang="), F.col("lang"), F.lit("&ref="),
        (F.col("doc_id") % 7).cast("string"),
    )
    ip_num = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).cast("long")
    host = F.parse_url(url, F.lit("HOST"))
    ip_str = F.concat_ws(
        ".",
        (ip_num / 16777216).cast("long").cast("string"),
        ((ip_num / 65536).cast("long") % 256).cast("string"),
        ((ip_num / 256).cast("long") % 256).cast("string"),
        (ip_num % 256).cast("string"),
    )
    octets = F.split(ip_str, r"\.")
    roundtrip = (
        octets[0].cast("long") * 16777216 + octets[1].cast("long") * 65536
        + octets[2].cast("long") * 256 + octets[3].cast("long")
    )
    return d.select(
        "doc_id",
        host.alias("host"),
        F.substring_index(host, ".", -1).alias("tld"),
        F.substring_index(host, ".", -2).alias("first_sig_domain"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        ip_str.alias("ip_str"),
        roundtrip.alias("ip_roundtrip"),
    )


@register(
    "audience_overlap_matrix",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM tu a JOIN tu b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def audience_overlap_matrix(spark, sf_dir):
    """r7, B26: the ClickHouse BITMAP-workload analog — audience
    overlap: for every pair of event types, the number of users who
    did BOTH (``bitmapAndCardinality(groupBitmapState(user_id) …)``,
    the segment-intersection query CH roaring bitmaps exist for).
    Spark-first shape: reduce to DISTINCT (type, user) FIRST (the
    bitmap build — one partial-aggregable distinct over a 5-type key
    space), then self-join the reduced set on user and count per type
    pair. The join input is |types| x |users|, never the event table;
    at 100 TB the distinct reduction is the only event-proportional
    stage and the pair count is bounded by types² x users. The oracle
    computes the same matrix from raw events independently."""
    ev = _t(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )


@register(
    "geo_funcs",
    oracle="""
    WITH pts AS (
      SELECT doc_id,
             CAST((doc_id * 73 % 160) - 80 + 0.5 AS DOUBLE) AS lat,
             CAST((doc_id * 37 % 360) - 180 + 0.5 AS DOUBLE) AS lon
      FROM documents
    )
    SELECT doc_id, lat, lon,
           ROUND(2 * 6371000.0 * asin(sqrt(
             pow(sin(radians(lat - 48.8566) / 2), 2)
             + cos(radians(48.8566)) * cos(radians(lat))
               * pow(sin(radians(lon - 2.3522) / 2), 2)
           )), 2) AS dist_paris_m,
           (lat BETWEEN -10 AND 40) AND (lon BETWEEN -20 AND 60)
             AND (lon - (-20)) * (40 - (-10)) - (lat - (-10)) * (60 - (-20)) >= 0
             AS in_triangle
    FROM pts
    """,
)
def geo_funcs(spark, sf_dir):
    """r7, B27: ClickHouse geo-function family —
    ``greatCircleDistance`` (haversine, meters from Paris) and a
    ``pointInPolygon`` case (half-plane + bounding-box test, exact
    sign arithmetic) — over lat/lon synthesized deterministically from
    doc_id (the fixtures carry no geo columns; the functions are under
    test). The distance is the one transcendental in the battery's
    oracle-checked surface, so it follows the registry rule: 2dp-
    rounded, with both engines evaluating the same closed form on
    IEEE-754 doubles (identical operation ORDER on both sides — the
    rounding absorbs the last-ulp libm differences). Map-only codegen
    scan."""
    d = _t(spark, sf_dir, "documents")
    lat = ((F.col("doc_id") * 73 % 160) - 80 + 0.5).cast("double")
    lon = ((F.col("doc_id") * 37 % 360) - 180 + 0.5).cast("double")
    plat, plon = 48.8566, 2.3522
    dist = 2 * 6371000.0 * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(lat - plat) / 2), 2)
        + F.cos(F.radians(F.lit(plat))) * F.cos(F.radians(lat))
        * F.pow(F.sin(F.radians(lon - plon) / 2), 2)
    ))
    in_tri = (
        lat.between(-10, 40) & lon.between(-20, 60)
        & ((lon - (-20)) * (40 - (-10)) - (lat - (-10)) * (60 - (-20)) >= 0)
    )
    return d.select(
        "doc_id",
        lat.alias("lat"),
        lon.alias("lon"),
        F.round(dist, 2).alias("dist_paris_m"),
        in_tri.alias("in_triangle"),
    )


@register(
    "dictget_customer_enrich",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS acctbal_sum,
           CAST(count(CASE WHEN c.c_nationkey < 10 THEN 1 END) AS BIGINT)
             AS n_tier_a
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def dictget_customer_enrich(spark, sf_dir):
    """r7, A-surface extension: ClickHouse EXTERNAL DICTIONARIES —
    ``dictGet``/``dictGetOrDefault``/``dictHas`` — the reference
    workload's scan-local dimension enrichment (CH pins bounded dims in
    memory on every server; a dictGet is a hash probe, never a join).
    Spark-first shape (`operators/dictionary.py`): nation and region
    are compiled into MAP LITERALS folded into the plan, so every probe
    is ``element_at`` inside whole-stage codegen — the customer scan
    has NO join, NO shuffle before the final aggregation (plan-gated in
    test_plans.py). Chained lookup (nation → regionkey → region name)
    mirrors CH hierarchical dictionaries; the tier column exercises
    ``dictGetOrDefault`` over a PARTIAL dictionary (keys < 10 → 'A',
    missing → default 'B'). The oracle recomputes everything with plain
    joins — dictionary vs join equivalence is the check."""
    from postgre_to_clickhouse_spark.operators.dictionary import Dictionary

    c = _t(spark, sf_dir, "customer")
    nation_dict = Dictionary.from_df(
        _t(spark, sf_dir, "nation"), "n_nationkey", ["n_name", "n_regionkey"]
    )
    region_dict = Dictionary.from_df(
        _t(spark, sf_dir, "region"), "r_regionkey", ["r_name"]
    )
    tier_dict = Dictionary.from_df(
        _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10),
        "n_nationkey",
        ["n_name"],
    )
    nkey = F.col("c_nationkey")
    enriched = c.select(
        region_dict.get("r_name", nation_dict.get("n_regionkey", nkey)).alias(
            "region_name"
        ),
        nation_dict.get("n_name", nkey).alias("nation_name"),
        F.when(tier_dict.has(nkey), F.lit("A")).otherwise(F.lit("B")).alias("tier"),
        "c_acctbal",
    )
    return enriched.groupBy("region_name", "nation_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("acctbal_sum"),
        F.count(F.when(F.col("tier") == "A", 1)).cast("bigint").alias("n_tier_a"),
    )


@register(
    "encoding_funcs",
    oracle="""
    SELECT doc_id,
           base64(encode(substring(text, 1, 24))) AS b64,
           CAST(from_base64(base64(encode(substring(text, 1, 24))))
                AS VARCHAR) AS b64_roundtrip,
           hex(doc_id * 255 + 16) AS hex_num,
           CAST(unhex(hex(encode(substring(lang, 1, 2)))) AS VARCHAR)
             AS hex_roundtrip
    FROM documents
    """,
)
def encoding_funcs(spark, sf_dir):
    """r7, B13 extension: the ClickHouse encoding-function family —
    ``base64Encode``/``base64Decode``, ``hex``/``unhex`` — as
    round-trips (any padding/alphabet/case disagreement between the
    engines breaks equality). Spark's uppercase minimal-digit integer
    hex matches DuckDB's ``hex(BIGINT)``; base64 is RFC 4648 with
    padding on both. Map-only codegen scan."""
    d = _t(spark, sf_dir, "documents")
    snip = F.substring("text", 1, 24).cast("binary")
    return d.select(
        "doc_id",
        F.base64(snip).alias("b64"),
        F.unbase64(F.base64(snip)).cast("string").alias("b64_roundtrip"),
        F.hex(F.col("doc_id") * 255 + 16).alias("hex_num"),
        F.unhex(F.hex(F.substring("lang", 1, 2).cast("binary"))).cast("string").alias("hex_roundtrip"),
    )


@register(
    "bitwise_funcs_agg",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band,
           bit_or(user_id) AS bor,
           bit_xor(user_id) AS bxor,
           bit_and(user_id << 2) AS band_shl,
           bit_or(user_id >> 1) AS bor_shr,
           bit_xor(xor(user_id, 2863311530)) AS bxor_mask,
           bit_and(~user_id) AS band_not
    FROM events GROUP BY event_type
    """,
)
def bitwise_funcs_agg(spark, sf_dir):
    """r7, B15 extension: ClickHouse bit functions —
    ``groupBitAnd``/``groupBitOr``/``groupBitXor`` aggregates composed
    with the scalar ``bitShiftLeft``/``bitShiftRight``/``bitXor``/
    ``bitNot`` (the flag-mask idioms of telemetry schemas). All exact
    64-bit integer ops — identical two's-complement semantics in both
    engines. One partial-aggregable groupBy."""
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id")
    return ev.groupBy("event_type").agg(
        F.bit_and(u).alias("band"),
        F.bit_or(u).alias("bor"),
        F.bit_xor(u).alias("bxor"),
        F.bit_and(F.shiftleft(u, 2)).alias("band_shl"),
        F.bit_or(F.shiftright(u, 1)).alias("bor_shr"),
        F.bit_xor(u.bitwiseXOR(F.lit(2863311530))).alias("bxor_mask"),
        F.bit_and(F.bitwise_not(u)).alias("band_not"),
    )


@register(
    "url_canonicalize_dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://' || upper(lang) || '.Example.COM/' || source || '/'
               || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed'
               || CAST(doc_id AS VARCHAR) || '&b=2&a=1#frag' || CAST(doc_id AS VARCHAR)
               AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(regexp_extract(regexp_replace(url, '#.*$', ''),
                     '^([^?]*)', 1), '(?i)^(https?://[^/]*)', 1))
             || regexp_replace(regexp_replace(regexp_extract(regexp_replace(url, '#.*$', ''),
                     '^([^?]*)', 1), '(?i)^https?://[^/]*', ''), '/+$', '')
             || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS curl
      FROM (
        SELECT doc_id, url,
               array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(regexp_replace(url, '#.*$', ''),
                              '\\?(.*)$', 1), '&'),
                 p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS cq
        FROM raw)
    )
    SELECT curl AS canon_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM canon GROUP BY curl
    """,
)
def url_canonicalize_dedup(spark, sf_dir):
    """r7, C1/C4: URL canonicalization + dedup — the crawl-pipeline
    normalize-before-hash step (CH ``cutFragment``/``cutURLParameter``
    composed; CCNet/RefinedWeb dedup by canonical URL). URLs are
    synthesized with deliberate mess: uppercase scheme/host, per-doc
    ``utm_*`` tracking junk, unsorted params, fragments — 50 docs per
    (lang, source, path-bucket) collapse to one canonical URL only if
    every normalization step fires. `operators/text_clean.py::
    canonicalize_url`; the oracle reimplements the pipeline in DuckDB
    regexp/list ops. Map-only scan + one partial-aggregable groupBy."""
    from postgre_to_clickhouse_spark.operators.text_clean import canonicalize_url

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"), F.upper("lang"), F.lit(".Example.COM/"), F.col("source"),
        F.lit("/"), (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed"), F.col("doc_id").cast("string"),
        F.lit("&b=2&a=1#frag"), F.col("doc_id").cast("string"),
    )
    return (
        d.select("doc_id", canonicalize_url(url).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "format_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_ts,
           strftime(o_orderdate, '%a %b %d %Y') AS pretty,
           strftime(o_orderdate, '%j') AS day_of_year,
           dayname(o_orderdate) AS dow_name,
           monthname(o_orderdate) AS month_name,
           CAST(strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M'),
                         '%d/%m/%Y %H:%M') AS TIMESTAMP) AS parsed_back
    FROM orders
    """,
)
def format_datetime_funcs(spark, sf_dir):
    """r7, B14 extension: ClickHouse ``formatDateTime`` /
    ``parseDateTimeBestEffort`` family — locale-stable text formatting
    (ISO, pretty, day-of-year, day/month names) plus a format→parse
    ROUND-TRIP (`to_timestamp` with an explicit pattern ≡ DuckDB
    ``strptime``; any format-token disagreement surfaces as a value
    mismatch). Patterns stay inside the Java-SimpleDateFormat ∩
    strftime subset that renders identically (week-number tokens are
    excluded — `ww` vs `%W` use different week definitions). English
    locale on both engines; UTC session. Map-only codegen scan."""
    o = _t(spark, sf_dir, "orders")
    t = F.col("o_orderdate")
    fmt = F.date_format(t, "dd/MM/yyyy HH:mm")
    return o.select(
        "o_orderkey",
        F.date_format(t, "yyyy-MM-dd HH:mm:ss").alias("iso_ts"),
        F.date_format(t, "EEE MMM dd yyyy").alias("pretty"),
        F.date_format(t, "DDD").alias("day_of_year"),
        F.date_format(t, "EEEE").alias("dow_name"),
        F.date_format(t, "MMMM").alias("month_name"),
        F.to_timestamp(fmt, "dd/MM/yyyy HH:mm").alias("parsed_back"),
    )


@register(
    "array_set_ops",
    oracle="""
    SELECT user_id,
           coalesce(array_to_string(list_sort(coalesce(l_even, [])), ','), '')
             AS types_even,
           coalesce(array_to_string(list_sort(list_distinct(
             coalesce(l_even, []) || coalesce(l_odd, []))), ','), '')
             AS types_union,
           coalesce(array_to_string(list_sort(list_filter(coalesce(l_even, []),
             x -> list_contains(coalesce(l_odd, []), x))), ','), '')
             AS types_intersect,
           coalesce(array_to_string(list_sort(list_filter(coalesce(l_even, []),
             x -> NOT list_contains(coalesce(l_odd, []), x))), ','), '')
             AS types_except,
           CAST(len(list_distinct(coalesce(l_even, []) || coalesce(l_odd, [])))
                AS INT) AS n_union
    FROM (
      SELECT user_id,
             array_agg(DISTINCT event_type)
               FILTER (WHERE event_id % 2 = 0) AS l_even,
             array_agg(DISTINCT event_type)
               FILTER (WHERE event_id % 2 = 1) AS l_odd
      FROM events GROUP BY user_id
    )
    """,
)
def array_set_ops(spark, sf_dir):
    """r7, B17 extension: the ClickHouse array set-operation family —
    ``arrayIntersect`` / ``arrayDistinct``-union / array difference
    (``arrayFilter(NOT has(...))``) — over per-user event-type sets
    split by event-id parity (two deterministic collect_sets per user).
    Both engines SORT every result array: set ops define membership,
    not order, and collect_set/array_agg order is engine- and
    partition-dependent — sorting is what makes the comparison
    well-defined (emitted as comma-joined text: the driver canon
    compares scalar cells). One partial-aggregable groupBy; the set ops are
    per-row array expressions in codegen."""
    ev = _t(spark, sf_dir, "events")
    even = F.collect_set(F.when(F.col("event_id") % 2 == 0, F.col("event_type")))
    odd = F.collect_set(F.when(F.col("event_id") % 2 == 1, F.col("event_type")))
    g = ev.groupBy("user_id").agg(even.alias("a"), odd.alias("b"))
    return g.select(
        "user_id",
        F.array_join(F.array_sort("a"), ",").alias("types_even"),
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("types_union"),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias("types_intersect"),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("types_except"),
        F.size(F.array_union("a", "b")).alias("n_union"),
    )
