package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.prep._

/** Feature-inference / selection / categorical / datetime coverage
  * (SURVEY §2.1 rows 1-3 and 15-21).
  */
object CatPrepQueries {

  // ---------------------------------------------------------------- §2.1/1
  val inferTypes: Q = Q(
    "infer_types",
    (s, dir) => {
      val schema = Tables.customer(s, dir).schema
      import s.implicits._
      FeatureTypes.infer(schema).map { case (c, t) => (c, t.name) }.toDF("col", "ftype")
    },
    Some("""
      SELECT column_name AS col,
             CASE WHEN column_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT','HUGEINT',
                                       'FLOAT','DOUBLE','DECIMAL') THEN 'numerical'
                  WHEN column_type = 'VARCHAR' THEN 'categorical'
                  WHEN column_type = 'BOOLEAN' THEN 'boolean'
                  WHEN column_type LIKE 'TIMESTAMP%' OR column_type = 'DATE' THEN 'datetime'
                  ELSE 'other' END AS ftype
      FROM (DESCRIBE customer)
    """),
  )

  // ---------------------------------------------------------------- §2.1/2
  val selectFeatures: Q = Q(
    "select_features",
    (s, dir) => {
      val aug = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_acctbal"), col("c_name"), col("c_mktsegment"),
        lit(1.0).as("const_num"),
        lit("x").as("const_cat"),
        when(col("c_custkey") % 1000 === 0, "rare").otherwise("common").as("dom_cat"),
      )
      val model = FeatureSelector.fit(aug,
        numericalCols = Seq("c_acctbal", "const_num"),
        categoricalCols = Seq("c_name", "c_mktsegment", "const_cat", "dom_cat"),
        catLabelsThreshold = 0.02)
      val cols = Seq("c_acctbal", "const_num", "c_name", "c_mktsegment", "const_cat", "dom_cat")
      import s.implicits._
      cols.map(c => (c, model.dropped.getOrElse(c, "kept"))).toDF("col", "status")
    },
    Some("""
      WITH aug AS (
        SELECT c_custkey, c_acctbal, c_name, c_mktsegment,
               1.0 AS const_num, 'x' AS const_cat,
               CASE WHEN c_custkey % 1000 = 0 THEN 'rare' ELSE 'common' END AS dom_cat
        FROM customer)
      SELECT 'c_acctbal' AS col,
             CASE WHEN min(c_acctbal) = max(c_acctbal) THEN 'single value' ELSE 'kept' END AS status
      FROM aug
      UNION ALL
      SELECT 'const_num',
             CASE WHEN min(const_num) = max(const_num) THEN 'single value' ELSE 'kept' END
      FROM aug
      UNION ALL
      SELECT 'c_name',
             CASE WHEN count(*) <= 1 THEN 'single value'
                  WHEN max(cnt) >= 0.98 * sum(cnt) THEN 'dominant label >= 98%'
                  ELSE 'kept' END
      FROM (SELECT count(*) AS cnt FROM aug GROUP BY c_name)
      UNION ALL
      SELECT 'c_mktsegment',
             CASE WHEN count(*) <= 1 THEN 'single value'
                  WHEN max(cnt) >= 0.98 * sum(cnt) THEN 'dominant label >= 98%'
                  ELSE 'kept' END
      FROM (SELECT count(*) AS cnt FROM aug GROUP BY c_mktsegment)
      UNION ALL
      SELECT 'const_cat',
             CASE WHEN count(*) <= 1 THEN 'single value'
                  WHEN max(cnt) >= 0.98 * sum(cnt) THEN 'dominant label >= 98%'
                  ELSE 'kept' END
      FROM (SELECT count(*) AS cnt FROM aug GROUP BY const_cat)
      UNION ALL
      SELECT 'dom_cat',
             CASE WHEN count(*) <= 1 THEN 'single value'
                  WHEN max(cnt) >= 0.98 * sum(cnt) THEN 'dominant label >= 98%'
                  ELSE 'kept' END
      FROM (SELECT count(*) AS cnt FROM aug GROUP BY dom_cat)
    """),
  )

  // ---------------------------------------------------------------- §2.1/3
  val shrinkLabels: Q = Q(
    "shrink_labels",
    (s, dir) => {
      val df = Tables.part(s, dir)
      val model = CategoricalTransformer.fit(df, Seq("p_brand"), threshold = 0.0395)
      df.select(
        col("p_partkey"),
        CategoricalTransformer.shrink(col("p_brand"), model("p_brand")).as("shrunk"),
        CategoricalTransformer.cleanNulls(
          when(col("p_partkey") % 11 === 0, "").otherwise(col("p_brand"))).as("none_norm"),
      )
    },
    Some("""
      WITH counts AS (SELECT p_brand, count(*) AS cnt FROM part GROUP BY 1),
           tot AS (SELECT count(*) AS total FROM part)
      SELECT p_partkey,
             CASE WHEN cnt < 0.0395 * total THEN 'other' ELSE part.p_brand END AS shrunk,
             CASE WHEN p_partkey % 11 = 0 THEN 'None' ELSE part.p_brand END AS none_norm
      FROM part JOIN counts ON part.p_brand = counts.p_brand, tot
    """),
  )

  // -------------------------------------------------------------- §2.1/15
  val oneHot: Q = Q(
    "onehot",
    (s, dir) => {
      val df = Tables.documents(s, dir)
      val model = CategoricalTransformer.fit(df, Seq("lang"), threshold = 0.01)
      df.select(col("doc_id") +: CategoricalTransformer.oneHot("lang", model("lang")): _*)
    },
    Some("""
      SELECT doc_id,
             CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS lang_de,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lang_en,
             CASE WHEN lang = 'es' THEN 1 ELSE 0 END AS lang_es,
             CASE WHEN lang = 'fr' THEN 1 ELSE 0 END AS lang_fr,
             CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS lang_zh
      FROM documents
    """),
  )

  // -------------------------------------------------------------- §2.1/16
  val oneHotRoundtrip: Q = Q(
    "onehot_roundtrip",
    (s, dir) => {
      val df = Tables.documents(s, dir)
      val model = CategoricalTransformer.fit(df, Seq("lang"), threshold = 0.01)
      val encoded = df.select(
        col("doc_id") +: CategoricalTransformer.oneHot("lang", model("lang")): _*)
      encoded.select(col("doc_id"),
        CategoricalTransformer.noneToNull(
          CategoricalTransformer.inverseOneHot("lang", model("lang"))).as("lang"))
    },
    Some("SELECT doc_id, lang FROM documents"),
  )

  // -------------------------------------------------------------- §2.1/17
  val labelEncode: Q = Q(
    "label_encode",
    (s, dir) => {
      val df = Tables.customer(s, dir)
      val classes = CategoricalTransformer.fitLabelEncoder(df, "c_mktsegment")
      df.select(
        col("c_custkey"),
        CategoricalTransformer.labelEncode(col("c_mktsegment"), classes).as("y"),
        CategoricalTransformer.labelDecode(
          CategoricalTransformer.labelEncode(col("c_mktsegment"), classes), classes)
          .as("decoded"),
      )
    },
    Some("""
      SELECT c_custkey, (dense_rank() OVER (ORDER BY c_mktsegment) - 1)::INT AS y,
             c_mktsegment AS decoded
      FROM customer
    """),
  )

  // -------------------------------------------------------------- §2.1/18
  val targetRegression: Q = Q(
    "target_regression",
    (s, dir) => {
      val df = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice").as("v"))
      val st = NumericalTransformer.fit(df, Seq("v"))("v")
      val sc = MinMaxScaler(st.min, st.max)
      df.select(col("o_orderkey"),
        round(sc.transform(col("v")), 6).as("y"),
        round(sc.inverse(sc.transform(col("v"))), 4).as("roundtrip"))
    },
    Some("""
      SELECT o_orderkey,
             round((o_totalprice - min(o_totalprice) OVER ()) /
                   (max(o_totalprice) OVER () - min(o_totalprice) OVER ()), 6) AS y,
             round(o_totalprice, 4) AS roundtrip
      FROM orders
    """),
  )

  // -------------------------------------------------------------- §2.1/19
  val datetimeEpoch: Q = Q(
    "datetime_epoch",
    (s, dir) => {
      val df = Tables.orders(s, dir).select(col("o_orderkey"),
        DatetimeTransformer.toEpochSeconds(col("o_orderdate")).as("e"))
      val st = NumericalTransformer.fit(df, Seq("e"))("e")
      val sc = MinMaxScaler(st.min, st.max)
      df.select(col("o_orderkey"),
        round(sc.transform(col("e")), 6).as("scaled"),
        DatetimeTransformer.fromEpochSeconds(sc.inverse(sc.transform(col("e")))).as("rt"))
    },
    Some("""
      SELECT o_orderkey,
             round((epoch(o_orderdate) - min(epoch(o_orderdate)) OVER ()) /
                   (max(epoch(o_orderdate)) OVER () - min(epoch(o_orderdate)) OVER ()), 6)
               AS scaled,
             o_orderdate AS rt
      FROM orders
    """),
  )

  // -------------------------------------------------------------- §2.1/20
  val datetimeInfer: Q = Q(
    "datetime_infer",
    (s, dir) => {
      val strings = Tables.orders(s, dir).select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("s"))
      val fmt = DatetimeTransformer.detectFormat(strings, "s")
        .getOrElse(sys.error("no datetime format detected"))
      strings.select(col("o_orderkey"), DatetimeTransformer.parse(col("s"), fmt).as("parsed"))
    },
    Some("""
      SELECT o_orderkey, strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS parsed
      FROM orders
    """),
  )

  // -------------------------------------------------------------- §2.1/21
  val boolToInt: Q = Q(
    "bool_to_int",
    (s, dir) => {
      val df = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        (col("l_returnflag") === "R").as("b"))
      df.select(col("l_orderkey"), col("l_linenumber"),
        col("b").cast("int").as("b_int"),
        col("b").cast("int").cast("boolean").as("b_rt"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS b_int,
             l_returnflag = 'R' AS b_rt
      FROM lineitem
    """),
  )

  // -------------------------------------------------------------- §2.1/17b
  /** Smoothed target-mean encoding of c_mktsegment against c_acctbal
    * (k=10 prior toward the global mean).
    */
  val targetMeanEncode: Q = Q(
    "target_mean_encode",
    (s, dir) => {
      val df = Tables.customer(s, dir)
      val model = CategoricalTransformer.fitTargetMeanEncoder(
        df, "c_mktsegment", "c_acctbal", smoothing = 10.0)
      df.select(col("c_custkey"),
        round(model.encode(col("c_mktsegment")), 6).as("enc"))
    },
    Some("""
      WITH g AS (
        SELECT c_mktsegment, avg(c_acctbal) AS m, count(c_acctbal) AS n
        FROM customer GROUP BY 1),
      gm AS (SELECT avg(c_acctbal) AS gmean FROM customer)
      SELECT c_custkey,
             round((g.n * g.m + 10.0 * gm.gmean) / (g.n + 10.0), 6) AS enc
      FROM customer
      JOIN g USING (c_mktsegment), gm
    """),
  )

  // -------------------------------------------------------------- §2.1/17c
  /** Frequency encoding of event_type: category → fit-data relative
    * frequency, unseen → 0; bounded fit collect, literal-map
    * transform (no join).
    */
  val freqEncode: Q = Q(
    "freq_encode",
    (s, dir) => {
      val df = Tables.events(s, dir)
      val model = CategoricalTransformer.fitFrequencyEncoder(df, "event_type")
      df.select(col("event_id"),
        round(model.encode(col("event_type")), 6).as("enc"))
    },
    Some("""
      WITH f AS (SELECT event_type, count(*) AS n FROM events
                 WHERE event_type IS NOT NULL GROUP BY 1),
      t AS (SELECT count(*) AS t FROM events)
      SELECT event_id, round(coalesce(f.n / t.t, 0), 6) AS enc
      FROM events LEFT JOIN f USING (event_type), t
    """),
  )

  // -------------------------------------------------------------- §2.1/20b
  /** Datetime null interpolation inside the Preprocessor transform
    * (reference: datetime_transformer.py:99-101 — sort by the first
    * datetime column, epoch-convert, linear-interpolate nulls, scale).
    * Fixture: events with d1 = ts (complete, the sort key) and d2 =
    * ts+1h with every 7th value nulled; seriesKey = user_id partitions
    * the interpolation window (the scale path).
    */
  val datetimeInterpolate: Q = Q(
    "datetime_interpolate",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("d1"),
        when(col("event_id") % 7 === 0, lit(null).cast("timestamp"))
          .otherwise(timestamp_micros(expr("ts div 1000") + lit(3600000000L))).as("d2"))
      val model = Preprocessor.fit(ev, PrepConfig(
        seriesKey = Some("user_id"),
        excludedCols = Seq("user_id", "event_id"),
        scaling = Scaling.Normalize))
      model.transform(ev).select(col("user_id"), col("event_id"),
        round(col("d1"), 6).as("d1"), round(col("d2"), 6).as("d2"))
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_id,
               epoch_us(ts) / 1000000.0 AS e1,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE (epoch_us(ts) + 3600000000) / 1000000.0 END AS e2
        FROM events),
      st AS (
        SELECT min(e1) AS min1, max(e1) AS max1,
               min(e2) AS min2, max(e2) AS max2 FROM base),
      p1 AS (
        SELECT user_id, event_id, e1, e2,
               row_number() OVER w AS rn,
               CASE WHEN e2 IS NOT NULL THEN row_number() OVER w END AS rn_of
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY e1)),
      p2 AS (
        SELECT user_id, event_id, e1, rn,
               coalesce(e2,
                 last_value(e2 IGNORE NULLS) OVER back
                 + (first_value(e2 IGNORE NULLS) OVER fwd
                    - last_value(e2 IGNORE NULLS) OVER back)
                   * (rn - last_value(rn_of IGNORE NULLS) OVER back)
                   / (first_value(rn_of IGNORE NULLS) OVER fwd
                      - last_value(rn_of IGNORE NULLS) OVER back)) AS e2i
        FROM p1
        WINDOW back AS (PARTITION BY user_id ORDER BY e1
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY user_id ORDER BY e1
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, event_id,
             round((e1 - st.min1) / (st.max1 - st.min1), 6) AS d1,
             round((e2i - st.min2) / (st.max2 - st.min2), 6) AS d2
      FROM p2, st
    """),
  )

  /** Hashing-trick categorical encoder (sklearn `FeatureHasher`
    * analog, n_features=64): each "col=value" token hashes to a
    * bucket (md5-h16 % 64) with a ±1 sign from an independent md5
    * nibble (collision debiasing, the FeatureHasher
    * `alternate_sign` semantic); per-row bucket values are the
    * signed sums, emitted in sparse long format. Unlike one-hot, the
    * output width is FIXED at any cardinality — the encoder a 100 TB
    * pipeline uses when the vocabulary is unbounded: no fit pass, no
    * dictionary state, pure narrow expressions + one
    * map-side-combined groupBy on (row, bucket).
    */
  val featureHash: Q = Q(
    "feature_hash",
    (s, dir) => {
      val toks = Tables.customer(s, dir).select(col("c_custkey"),
        explode(array(
          concat(lit("c_mktsegment="), col("c_mktsegment")),
          concat(lit("c_nationkey="), col("c_nationkey").cast("string")))).as("tok"))
      val hx = md5(col("tok"))
      toks.select(col("c_custkey"),
          (conv(substring(hx, 1, 4), 16, 10).cast("long") % 64).as("bucket"),
          when(conv(substring(hx, 5, 1), 16, 10).cast("long") % 2 === 0, lit(1))
            .otherwise(lit(-1)).as("sign"))
        .groupBy(col("c_custkey"), col("bucket"))
        .agg(sum(col("sign")).as("val"))
    },
    Some(s"""
      WITH t AS (
        SELECT c_custkey, unnest(['c_mktsegment=' || c_mktsegment,
                                  'c_nationkey=' || c_nationkey::VARCHAR]) AS tok
        FROM customer),
      h AS (SELECT c_custkey, md5(tok) AS hx FROM t)
      SELECT c_custkey, ${OracleExact.h16Sql("hx")} % 64 AS bucket,
             sum(CASE WHEN (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) % 2 = 0
                      THEN 1 ELSE -1 END)::BIGINT AS val
      FROM h GROUP BY 1, 2
    """),
  )

  /** LEAKAGE-SAFE (out-of-fold) target encoding — the CV sibling of
    * [[targetMeanEncode]] and what a training pipeline must actually
    * use (in-fold means leak the row's own label): each row's
    * encoding is the target mean of its category computed over the
    * OTHER four md5-assigned folds, exact decimal sums so the
    * subtraction (global − own-fold) replays bit-for-bit; a category
    * entirely inside one fold falls back to the (exact-sum) global
    * mean. Per-(category, fold) stats are bounded and broadcast.
    */
  val targetEncodeCv: Q = Q(
    "target_encode_cv",
    (s, dir) => {
      import graft.operators.ExactAgg
      val fold = (conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
        .cast("long") % 5).as("fold")
      val r = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("y"), fold)
      val gRow = r.agg(ExactAgg.decSum(col("y")), count(col("y"))).head()
      val gmean = gRow.getDouble(0) / gRow.getLong(1)
      val sf = r.groupBy(col("seg"), col("fold"))
        .agg(ExactAgg.decSum(col("y")).as("s"), count(col("y")).as("n"))
      val st = r.groupBy(col("seg"))
        .agg(ExactAgg.decSum(col("y")).as("gs"), count(col("y")).as("gn"))
      r.join(broadcast(sf), Seq("seg", "fold"))
        .join(broadcast(st), Seq("seg"))
        .select(col("c_custkey"), col("fold"),
          round(when(col("gn") - col("n") === 0, lit(gmean))
            .otherwise((col("gs") - col("s")) / (col("gn") - col("n"))), 6)
            .as("enc"))
    },
    Some(s"""
      WITH r AS (
        SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS y,
               ${OracleExact.h16Sql("md5(c_custkey::VARCHAR)")} % 5 AS fold
        FROM customer),
      sf AS (SELECT seg, fold, ${OracleExact.decSumSql("y")} AS s, count(y) AS n
             FROM r GROUP BY 1, 2),
      st AS (SELECT seg, ${OracleExact.decSumSql("y")} AS gs, count(y) AS gn
             FROM r GROUP BY 1),
      gm AS (SELECT ${OracleExact.decSumSql("y")} / count(y) AS g FROM r)
      SELECT r.c_custkey, r.fold,
             round(CASE WHEN st.gn - sf.n = 0 THEN gm.g
                        ELSE (st.gs - sf.s) / (st.gn - sf.n) END, 6) AS enc
      FROM r
      JOIN sf ON r.seg = sf.seg AND r.fold = sf.fold
      JOIN st ON r.seg = st.seg, gm
    """),
  )

  /** Mode imputation for categoricals — sklearn
    * `SimpleImputer(strategy="most_frequent")`, the categorical
    * sibling of fill_mean/fill_median/fill_regression: fit = the most
    * frequent NON-MISSING label (deterministic tie-break to the
    * lexicographically smallest — sklearn's own rule), applied as a
    * narrow coalesce-style transform. Fit state is one label (the
    * scaler-stat pattern); the only data-scale pass is the
    * map-side-combined label rollup. Fixture empties every 11th key
    * (the prep_pipeline convention — TESTDATA has no missing values).
    */
  val fillMode: Q = Q(
    "fill_mode",
    (s, dir) => {
      val df = Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit("")).otherwise(col("c_mktsegment"))
          .as("seg"))
      val mode = df.where(col("seg") =!= "")
        .groupBy(col("seg")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("seg")).head().getString(0)
      df.select(col("c_custkey"),
        when(col("seg") === "", lit(mode)).otherwise(col("seg")).as("filled"),
        (col("seg") === "").cast("int").as("was_imputed"))
    },
    Some("""
      WITH d AS (SELECT c_custkey,
                        CASE WHEN c_custkey % 11 = 0 THEN '' ELSE c_mktsegment END AS seg
                 FROM customer),
      md AS (SELECT seg FROM d WHERE seg <> ''
             GROUP BY seg ORDER BY count(*) DESC, seg LIMIT 1)
      SELECT c_custkey,
             CASE WHEN seg = '' THEN (SELECT seg FROM md) ELSE seg END AS filled,
             (seg = '')::INT AS was_imputed
      FROM d
    """),
  )

  val all: Seq[Q] = Seq(inferTypes, selectFeatures, shrinkLabels, oneHot,
    oneHotRoundtrip, labelEncode, targetMeanEncode, targetEncodeCv,
    targetRegression, datetimeEpoch, datetimeInfer, datetimeInterpolate,
    boolToInt, freqEncode, featureHash, fillMode)
}
