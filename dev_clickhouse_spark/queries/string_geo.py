"""ClickHouse string-search / geo / bitmap-aggregate parity (round 8).

Stock ClickHouse surface a reference user would reach for that had no
counterpart yet: ``editDistance`` (a.k.a. levenshteinDistance),
``multiSearchAny``, ``countSubstrings``, ``position``,
``greatCircleDistance``, and the ``groupBitmap*`` cardinality family
(groupBitmapOr/And/Xor over per-group member bitmaps).

Scale design: the string functions are all JVM-native whole-stage-codegen
expressions (split/levenshtein/contains/replace/instr) — map-only, no
Python, no shuffle before the final small aggregate.  The geo query is a
broadcast cross join of a 25-row dim with itself.  The bitmap family is
ONE user-keyed aggregate — the membership bitmap never materializes as a
wide row; "bitmapAndCardinality across groups" is re-expressed as
"members whose per-user distinct-group count equals the group count",
which is how you'd actually compute it at 10^11 users.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register

#: multiSearchAny needle set (color words occurring in TPC-H p_name).
_NEEDLES = ("red", "green", "blue", "white", "black")


@register(
    "string_search_distance_by_brand",
    oracle="""
WITH p AS (
  SELECT p_brand,
         string_split(p_name, ' ')[1] AS w1,
         string_split(p_name, ' ')[-1] AS wl,
         CASE WHEN p_name LIKE '%red%' OR p_name LIKE '%green%'
                OR p_name LIKE '%blue%' OR p_name LIKE '%white%'
                OR p_name LIKE '%black%' THEN 1 ELSE 0 END AS any_color,
         length(p_name) - length(replace(p_name, 'a', '')) AS n_a,
         strpos(p_name, 'e') AS pos_e
  FROM part
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       floor(avg(CAST(levenshtein(w1, wl) AS DOUBLE)) * 10000 + 0.5)
         / 10000 AS avg_edit_distance,
       CAST(sum(any_color) AS BIGINT) AS n_any_color,
       CAST(sum(n_a) AS BIGINT) AS total_a,
       CAST(sum(pos_e) AS BIGINT) AS sum_pos_e
FROM p GROUP BY p_brand
""",
    tags=["clickhouse-parity", "string-search"],
)
def string_search_distance_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse string-function parity rolled into one per-brand
    aggregate: ``editDistance(first word, last word)`` of p_name
    (classic Levenshtein — Spark's JVM ``levenshtein`` and DuckDB's
    ``levenshtein`` implement the identical DP), ``multiSearchAny``
    over a 5-color needle set (ORed substring containment),
    ``countSubstrings(p_name, 'a')`` via the length-difference identity,
    and ``position(p_name, 'e')`` (1-based, 0 when absent — instr/strpos
    agree).  All integer outputs except the 4dp average — nothing to
    drift cross-engine."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    any_color = F.when(
        F.lit(False) | (
            F.col("p_name").contains(_NEEDLES[0])
            | F.col("p_name").contains(_NEEDLES[1])
            | F.col("p_name").contains(_NEEDLES[2])
            | F.col("p_name").contains(_NEEDLES[3])
            | F.col("p_name").contains(_NEEDLES[4])
        ), 1
    ).otherwise(0)
    base = p.select(
        "p_brand",
        F.element_at(words, 1).alias("w1"),
        F.element_at(words, -1).alias("wl"),
        any_color.alias("any_color"),
        (
            F.length("p_name")
            - F.length(F.replace(F.col("p_name"), F.lit("a"), F.lit("")))
        ).alias("n_a"),
        F.instr(F.col("p_name"), "e").alias("pos_e"),
    )
    return base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        rnd(
            F.avg(F.levenshtein("w1", "wl").cast("double")), 4
        ).alias("avg_edit_distance"),
        F.sum("any_color").cast("bigint").alias("n_any_color"),
        F.sum("n_a").cast("bigint").alias("total_a"),
        F.sum("pos_e").cast("bigint").alias("sum_pos_e"),
    )


def haversine_meters(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (haversine, sphere R = 6371 km —
    the mean radius ClickHouse's ``greatCircleDistance`` documents) as a
    codegen-friendly Column expression over degree inputs."""
    sdlat = F.sin(F.radians((lat2 - lat1) / 2))
    sdlon = F.sin(F.radians((lon2 - lon1) / 2))
    h = (
        sdlat * sdlat
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sdlon * sdlon
    )
    return 2 * 6371000 * F.asin(F.sqrt(h))


@register(
    "great_circle_nation_pairs",
    oracle="""
WITH pts AS (
  SELECT n_nationkey AS k,
         CAST((n_nationkey * 7919) % 179 - 89 AS DOUBLE) AS lat,
         CAST((n_nationkey * 104729) % 359 - 179 AS DOUBLE) AS lon
  FROM nation
)
SELECT a.k AS k1, b.k AS k2,
       CAST(floor(
         2 * 6371000 * asin(sqrt(
           sin(radians((b.lat - a.lat) / 2)) * sin(radians((b.lat - a.lat) / 2))
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * sin(radians((b.lon - a.lon) / 2))
             * sin(radians((b.lon - a.lon) / 2))
         )) + 0.5) AS BIGINT) AS meters
FROM pts a JOIN pts b ON a.k < b.k
""",
    tags=["clickhouse-parity", "geo"],
)
def great_circle_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``greatCircleDistance(lon1, lat1, lon2, lat2)`` parity:
    haversine distance (sphere radius 6371 km, the same mean radius the
    ClickHouse function documents) between deterministic per-nation
    coordinates, for every ordered nation pair.  Coordinates derive from
    n_nationkey by exact integer modular arithmetic — identical in both
    engines — and the trig pipeline rounds to whole meters, 9 orders of
    magnitude above any libm last-ulp divergence.  The pair join is a
    broadcast cross of a 25-row dim; at any scale a geo-pair query of this
    shape broadcasts the smaller point set."""
    nation = load_table(spark, sf_dir, "nation")
    pts = nation.select(
        F.col("n_nationkey").alias("k"),
        ((F.col("n_nationkey") * 7919) % 179 - 89)
        .cast("double").alias("lat"),
        ((F.col("n_nationkey") * 104729) % 359 - 179)
        .cast("double").alias("lon"),
    )
    a = pts.alias("a")
    b = pts.alias("b")
    meters = F.floor(
        haversine_meters(
            F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
        )
        + F.lit(0.5)
    ).cast("bigint")
    return (
        a.join(F.broadcast(b), F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            meters.alias("meters"),
        )
    )


@register(
    "bitmap_users_across_event_types",
    oracle="""
WITH per_user AS (
  SELECT user_id, count(DISTINCT event_type) AS k
  FROM events GROUP BY user_id
),
nt AS (SELECT count(DISTINCT event_type) AS n_types FROM events)
SELECT CAST(nt.n_types AS BIGINT) AS n_types,
       CAST(count(*) AS BIGINT) AS or_card,
       CAST(count(*) FILTER (WHERE k = nt.n_types) AS BIGINT) AS and_card,
       CAST(count(*) FILTER (WHERE k % 2 = 1) AS BIGINT) AS xor_card
FROM per_user, nt
GROUP BY nt.n_types
""",
    tags=["clickhouse-parity", "bitmap"],
)
def bitmap_users_across_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``groupBitmap*`` cardinality parity over per-event-type
    user bitmaps: ``bitmapOrCardinality`` of all types (= distinct users),
    ``bitmapAndCardinality`` (= users present in EVERY type), and
    ``bitmapXorCardinality`` (= users in an ODD number of types — XOR of
    k sets keeps exactly the odd-membership elements).  Re-expressed as a
    single user-keyed distinct-type count plus a broadcast scalar for the
    type count — the only formulation that scales: materializing real
    roaring bitmaps per group and ANDing them is a driver-side pattern;
    this is one shuffle on user_id at any cardinality."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("k")
    )
    n_types = ev.agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return (
        per_user.crossJoin(F.broadcast(n_types))
        .groupBy("n_types")
        .agg(
            F.count(F.lit(1)).alias("or_card"),
            F.count(F.when(F.col("k") == F.col("n_types"), 1))
            .alias("and_card"),
            F.count(F.when(F.col("k") % 2 == 1, 1)).alias("xor_card"),
        )
        .select(
            F.col("n_types").cast("bigint").alias("n_types"),
            "or_card", "and_card", "xor_card",
        )
    )


#: hasAll/hasAny/arrayIntersect reference needle set (3 of the 5 testdata
#: event types — chosen so both predicates split the user population).
_REF_TYPES = ("click", "view", "purchase")


@register(
    "array_set_ops_user_types",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
compacted AS (
  SELECT user_id,
         CAST(1 + count(*) FILTER (WHERE prev_type IS NOT NULL
                                     AND event_type <> prev_type)
              AS BIGINT) AS n_compact
  FROM seq GROUP BY user_id
),
per_type AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
),
sets AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type IN ('click','view','purchase'))
              AS BIGINT) AS n_common,
         CAST(CASE WHEN count(*) FILTER (WHERE event_type IN
                ('click','view','purchase')) = 3 THEN 1 ELSE 0 END
              AS INTEGER) AS has_all,
         CAST(CASE WHEN count(*) FILTER (WHERE event_type IN
                ('click','view','purchase')) > 0 THEN 1 ELSE 0 END
              AS INTEGER) AS has_any,
         CAST(max(c) AS BIGINT) AS max_enum_uniq
  FROM per_type GROUP BY user_id
)
SELECT sets.user_id, n_common, has_all, has_any, max_enum_uniq, n_compact
FROM sets JOIN compacted ON sets.user_id = compacted.user_id
""",
    tags=["clickhouse-parity", "array-set-ops"],
)
def array_set_ops_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array set-function parity (``arrayIntersect``,
    ``hasAll``, ``hasAny``, ``arrayCompact``, ``arrayEnumerateUniq``) over
    each user's event-type history.  Spark side genuinely builds the
    arrays and runs the JVM higher-order/set functions: the distinct-type
    set via collect_set -> array_intersect/except/overlap against the
    3-type reference, the time-ordered sequence via sort_array of
    (ts, event_id, type) structs -> arrayCompact as a filter comparing each
    element to its predecessor slice, and arrayEnumerateUniq's max
    occurrence index = the max per-type count (aggregate over transform).
    The oracle derives the same facts with windows/aggregates.  One
    user-keyed shuffle; per-user arrays are bounded by that user's event
    count — the same contract as every sessionization here."""
    ev = load_table(spark, sf_dir, "events")
    ref = F.array(*[F.lit(t) for t in _REF_TYPES])
    per_user = ev.groupBy("user_id").agg(
        F.collect_set("event_type").alias("types"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq_structs"),
    )
    seq = F.transform("seq_structs", lambda s: s["event_type"])
    # arrayCompact: keep position i if i == 1 or seq[i] != seq[i-1]
    compact = F.filter(
        F.zip_with(
            F.col("seq"),
            F.concat(F.array(F.lit(None).cast("string")),
                     F.slice("seq", 1, F.greatest(F.size("seq") - 1, F.lit(0)))),
            lambda cur, prev: F.when(
                prev.isNull() | (cur != prev), cur
            ).otherwise(F.lit(None)),
        ),
        lambda x: x.isNotNull(),
    )
    # arrayEnumerateUniq max = max multiplicity of any type in seq
    max_enum = F.array_max(
        F.transform(
            "types",
            lambda t: F.size(F.filter("seq", lambda x: x == t)),
        )
    )
    return (
        per_user.withColumn("seq", seq)
        .select(
            "user_id",
            F.size(F.array_intersect("types", ref)).cast("bigint")
            .alias("n_common"),
            F.when(F.size(F.array_except(ref, F.col("types"))) == 0, 1)
            .otherwise(0).alias("has_all"),
            F.when(F.arrays_overlap("types", ref), 1).otherwise(0)
            .alias("has_any"),
            max_enum.cast("bigint").alias("max_enum_uniq"),
            F.size(compact).cast("bigint").alias("n_compact"),
        )
    )


#: sparkbar rendering: 20 buckets, block elements U+2581..U+2588 (chr
#: 9601..9608), space for an empty bucket.
_SPARKBAR_BUCKETS = 20


@register(
    "sparkbar_daily_events_by_type",
    oracle=f"""
WITH days AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
rng AS (
  SELECT min(d) AS dmin, max(d) AS dmax FROM days
),
bucketed AS (
  SELECT event_type,
         CAST(floor({_SPARKBAR_BUCKETS} * datediff('day', rng.dmin, d)
              / (datediff('day', rng.dmin, rng.dmax) + 1)) AS BIGINT) AS b,
         sum(c) AS s
  FROM days, rng GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, g.b, coalesce(bucketed.s, 0) AS s
  FROM (SELECT DISTINCT event_type FROM days) t
  CROSS JOIN (SELECT unnest(range(0, {_SPARKBAR_BUCKETS})) AS b) g
  LEFT JOIN bucketed ON bucketed.event_type = t.event_type
                    AND bucketed.b = g.b
),
lvl AS (
  SELECT event_type, b, s,
         CASE WHEN s = 0 THEN 32
              ELSE 9600 + CAST(greatest(floor(8.0 * s
                   / max(s) OVER (PARTITION BY event_type) + 0.5), 1)
                   AS BIGINT) END AS code
  FROM grid
)
SELECT event_type,
       string_agg(chr(CAST(code AS INTEGER)), '' ORDER BY b) AS bar,
       CAST(max(s) AS BIGINT) AS peak_bucket
FROM lvl GROUP BY event_type
""",
    tags=["clickhouse-parity", "sparkbar"],
)
def sparkbar_daily_events_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``sparkbar(N)(x, y)`` parity: a 20-bucket unicode
    bar-chart string of daily event volume per type.  The rendering rule
    is pinned deterministically (ClickHouse's own scaling changed across
    versions): bucket index = floor(N·(day − dmin)/(span + 1)) over the
    GLOBAL day range, level = clamp(floor(8·s/max_s + 0.5), 1, 8) for
    non-empty buckets (block elements U+2581..U+2588), space for empty —
    every quantity is a ratio of exact integers, so both engines pick
    identical code points.  Spark side: two narrow aggregates, a per-type
    bucket map, and a JVM transform over the 20-slot grid — the string is
    assembled by array_join, no per-row Python, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    rng = days.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    nb = _SPARKBAR_BUCKETS
    bucketed = (
        days.crossJoin(F.broadcast(rng))
        .select(
            "event_type", "c",
            F.floor(
                nb * F.datediff("d", "dmin")
                / (F.datediff("dmax", "dmin") + 1)
            ).alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.sum("c").alias("s"))
    )
    per_type = bucketed.groupBy("event_type").agg(
        F.map_from_entries(
            F.collect_list(F.struct("b", "s"))
        ).alias("m"),
        F.max("s").alias("mx"),
    )
    filled = F.transform(
        F.sequence(F.lit(0), F.lit(nb - 1)),
        lambda b: F.coalesce(
            F.element_at("m", b.cast("long")), F.lit(0).cast("long")
        ),
    )
    # NB: Spark's char()/chr() is ASCII-mod-256 (chr(9601) -> \x81), NOT a
    # Unicode code point like DuckDB's chr() — index a literal block-char
    # array instead (element_at is 1-based, matching level 1..8).
    blocks = F.array(*[F.lit(c) for c in "▁▂▃▄▅▆▇█"])
    bar = F.array_join(
        F.transform(
            "filled",
            lambda s: F.when(s == 0, F.lit(" ")).otherwise(
                F.element_at(
                    blocks,
                    F.greatest(
                        F.floor(8.0 * s / F.col("mx") + 0.5), F.lit(1)
                    ).cast("int"),
                )
            ),
        ),
        "",
    )
    return (
        per_type.withColumn("filled", filled)
        .select(
            "event_type",
            bar.alias("bar"),
            F.array_max("filled").cast("bigint").alias("peak_bucket"),
        )
    )


@register(
    "ngram_distance_by_brand",
    oracle="""
WITH w AS (
  SELECT p_brand,
         string_split(p_name, ' ')[1] AS a,
         string_split(p_name, ' ')[-1] AS b
  FROM part
),
g AS (
  SELECT p_brand,
         list_transform(range(1, greatest(length(a) - 2, 0) + 1),
                        i -> a[i:i+2]) AS ga,
         list_transform(range(1, greatest(length(b) - 2, 0) + 1),
                        i -> b[i:i+2]) AS gb
  FROM w
),
d AS (
  SELECT p_brand,
         CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
              ELSE 1.0 - 2.0 * coalesce(list_sum(list_transform(
                     list_distinct(ga || gb),
                     x -> least(len(list_filter(ga, y -> y = x)),
                                len(list_filter(gb, y -> y = x))))), 0)
                   / (len(ga) + len(gb)) END AS dist
  FROM g
)
SELECT p_brand,
       floor(avg(dist) * 1000000 + 0.5) / 1000000 AS avg_ngram_distance,
       CAST(count(*) FILTER (WHERE dist = 1.0) AS BIGINT) AS n_disjoint
FROM d GROUP BY p_brand
""",
    tags=["clickhouse-parity", "ngram-distance"],
)
def ngram_distance_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ngramDistance(a, b)`` parity with pinned semantics
    (ClickHouse hashes 4-grams internally; we pin character TRIGRAM
    multisets and Sørensen distance 1 − 2|A∩B|/(|A|+|B|), 0.0 when both
    sides have no trigram) between the first and last word of p_name,
    averaged per brand.  Both engines extract grams with genuine
    higher-order functions — Spark ``transform(sequence(...), i ->
    substr(s, i, 3))`` evaluated JVM-side, DuckDB ``list_transform(range
    (...), i -> s[i:i+2])`` — and compute the multiset intersection as
    Σ_g min(count_A(g), count_B(g)) over the distinct union.  Per-row cost
    is O(|grams|²) on ~10-char words — map-only, no shuffle before the
    brand aggregate."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    w = p.select(
        "p_brand",
        F.element_at(words, 1).alias("a"),
        F.element_at(words, -1).alias("b"),
    )

    def grams(col):
        # NB: Spark's sequence(1, 0) yields the DESCENDING [1, 0], not an
        # empty array (DuckDB's range(1, 1) IS empty) — guard short strings.
        return F.expr(
            f"CASE WHEN length({col}) < 3 THEN array()"
            f" ELSE transform(sequence(1, length({col}) - 2),"
            f" i -> substring({col}, i, 3)) END"
        )

    g = w.select("p_brand", grams("a").alias("ga"), grams("b").alias("gb"))
    inter = F.aggregate(
        F.transform(
            F.array_distinct(F.concat("ga", "gb")),
            lambda x: F.least(
                F.size(F.filter("ga", lambda y: y == x)),
                F.size(F.filter("gb", lambda y: y == x)),
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    tot = F.size("ga") + F.size("gb")
    dist = F.when(tot == 0, F.lit(0.0)).otherwise(
        1.0 - 2.0 * inter / tot
    )
    d = g.select("p_brand", dist.alias("dist"))
    return d.groupBy("p_brand").agg(
        rnd(F.avg("dist"), 6).alias("avg_ngram_distance"),
        F.count(F.when(F.col("dist") == 1.0, 1)).cast("bigint")
        .alias("n_disjoint"),
    )


@register(
    "transform_decode_event_scores",
    oracle="""
WITH u AS (
  SELECT event_type,
         CASE WHEN event_id % 2 = 0
              THEN '/API/v' || CAST(user_id % 3 AS VARCHAR)
                   || '/item/' || CAST(event_id AS VARCHAR)
              ELSE '/home/' || event_type END AS url
  FROM events
),
s AS (
  SELECT CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 3
         WHEN 'signup' THEN 10 WHEN 'purchase' THEN 25 ELSE 0 END AS score,
         CASE WHEN strpos(lower(url), lower('/Api')) > 0 THEN 1 ELSE 0 END
           AS api_hit,
         len(regexp_extract_all(url, '[0-9]+')) AS n_number_runs
  FROM u
)
SELECT CAST(sum(score) AS BIGINT) AS total_score,
       CAST(sum(api_hit) AS BIGINT) AS n_api_hits,
       CAST(sum(n_number_runs) AS BIGINT) AS total_number_runs,
       CAST(count(*) FILTER (WHERE score = 0) AS BIGINT) AS n_unmapped
FROM s
""",
    tags=["clickhouse-parity", "transform-decode"],
)
def transform_decode_event_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``transform(x, [from...], [to...], default)`` +
    ``positionCaseInsensitive`` + ``countMatches`` parity in one
    aggregate: event types decoded to scores through an in-plan literal
    MAP (the dictionary-decode idiom — evaluated inside whole-stage
    codegen, same mechanism as ``functions/dict.py``), a case-insensitive
    substring position on a deterministically synthesized url (events
    carry no url column; both engines build the identical string), and a
    regex match count (Spark ``regexp_count`` ↔ DuckDB
    ``len(regexp_extract_all)`` — both count non-overlapping matches left
    to right).  All-integer outputs."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "url",
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("/API/v"), (F.col("user_id") % 3).cast("string"),
                F.lit("/item/"), F.col("event_id").cast("string"),
            ),
        ).otherwise(F.concat(F.lit("/home/"), F.col("event_type"))),
    )
    decode = F.create_map(
        F.lit("view"), F.lit(1), F.lit("click"), F.lit(3),
        F.lit("signup"), F.lit(10), F.lit("purchase"), F.lit(25),
    )
    score = F.coalesce(
        F.element_at(decode, F.col("event_type")), F.lit(0)
    )
    api_hit = F.when(
        F.instr(F.lower(F.col("url")), "/api") > 0, 1
    ).otherwise(0)
    n_runs = F.regexp_count(F.col("url"), F.lit("[0-9]+"))
    s = ev.select(
        score.alias("score"), api_hit.alias("api_hit"),
        n_runs.alias("n_number_runs"),
    )
    return s.agg(
        F.sum("score").cast("bigint").alias("total_score"),
        F.sum("api_hit").cast("bigint").alias("n_api_hits"),
        F.sum("n_number_runs").cast("bigint").alias("total_number_runs"),
        F.count(F.when(F.col("score") == 0, 1)).cast("bigint")
        .alias("n_unmapped"),
    )
