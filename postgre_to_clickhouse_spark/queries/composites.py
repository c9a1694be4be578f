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
