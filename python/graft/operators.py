"""Flagship operator entry points from Python — the calls an LLM-data
pipeline makes directly, outside the fixture-bound query registry.
Each is one py4j hop into the Scala operator (same defaults).
"""

from pyspark.sql import DataFrame

from graft.session import bridge


def minhash_pairs(df, id_col, text_col, shingle_k=3, num_perms=128,
                  num_bands=32, threshold=0.8, seed=42):
    """MinHash -> LSH banded near-dup pairs: (id_a, id_b, jaccard >=
    threshold). Candidates come from the band equi-join only — never
    all pairs."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).minhashPairs(
        df._jdf, id_col, text_col, int(shingle_k), int(num_perms),
        int(num_bands), float(threshold), int(seed)), spark)


def knn_brute_force(corpus, queries, id_col, vec_col, k=5):
    """Exact cosine top-k of each query vector over the corpus."""
    spark = corpus.sparkSession
    return DataFrame(bridge(spark).knnBruteForce(
        corpus._jdf, queries._jdf, id_col, vec_col, int(k)), spark)


def sentence_dedup(df, id_col, text_col):
    """Corpus-wide sentence dedup with document reconstruction
    (Dolma-style boilerplate removal): (id, n_sents, n_kept, cleaned)."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).sentenceDedup(
        df._jdf, id_col, text_col), spark)


def dedup_by_url(docs, id_col, url_col):
    """URL-canonicalizing keep-first dedup: (canonical key, kept id,
    variant count)."""
    spark = docs.sparkSession
    return DataFrame(bridge(spark).dedupByUrl(
        docs._jdf, id_col, url_col), spark)


def ts_features(df, series_key, time_col, value_col):
    """Per-series tsfresh-style feature matrix (one row per series)."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).tsFeatures(
        df._jdf, series_key, time_col, value_col), spark)


def connected_components(pairs, max_iter=20):
    """Connected components over an (id_a, id_b) pair table — the
    cluster step after any pair generator: (id, component min-id)."""
    spark = pairs.sparkSession
    return DataFrame(bridge(spark).connectedComponents(
        pairs._jdf, int(max_iter)), spark)


def pii_scan(df, text_col):
    """Per-document PII match counts by category plus redacted text."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).piiScan(df._jdf, text_col), spark)


def knn_ivf(corpus, queries, id_col, vec_col, k=5, n_cells=16, n_probe=4):
    """IVF ANN top-k: md5-sampled coarse cells; only n_probe of
    n_cells cells are scored per query."""
    spark = corpus.sparkSession
    return DataFrame(bridge(spark).knnIvf(
        corpus._jdf, queries._jdf, id_col, vec_col, int(k), int(n_cells),
        int(n_probe)), spark)


def embedding_pairs_auto(df, id_col, vec_col, threshold=0.9, sim_grade=0.99):
    """Embedding near-dup pairs with CORPUS-ADAPTIVE LSH sizing:
    (tables, bits) derived from the corpus count so bucket occupancy
    stays constant at any scale (the linear configuration); candidates
    come from the hyperplane-bucket join only, verified by exact
    cosine >= threshold."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).embeddingPairsAuto(
        df._jdf, id_col, vec_col, float(threshold), float(sim_grade)), spark)


def knn_hnsw(corpus, queries, id_col, vec_col, k=5, route_shards=0):
    """Shard-graph ANN top-k with corpus-adaptive shard count (linear
    build). route_shards > 0 routes each query to only its best shards
    by entry-point cosine — the IVF-nProbe-style serving trade
    (recall-vs-fraction measured by the knn_hnsw_routed bench row)."""
    spark = corpus.sparkSession
    return DataFrame(bridge(spark).knnHnswAuto(
        corpus._jdf, queries._jdf, id_col, vec_col, int(k),
        int(route_shards)), spark)


def adf_autolag(df, series_key, time_col, value_col):
    """Augmented Dickey-Fuller per series with statsmodels-style AIC
    lag selection (maxLag 1) and the MacKinnon regression-surface
    p-value: (key, adf_stat, adf_p, adf_lag, adf_nobs)."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).adfAutolag(
        df._jdf, series_key, time_col, value_col), spark)


def matrix_profile_motif(df, series_key, time_col, value_col,
                         window=4, band=20):
    """Motif/discord locations over the banded z-normalized matrix
    profile: (key, motif_idx, motif_dist, discord_idx, discord_dist)."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).matrixProfileMotif(
        df._jdf, series_key, time_col, value_col, int(window), int(band)), spark)


def matrix_profile_fluss(df, series_key, time_col, value_col,
                         window=4, band=20):
    """FLUSS regime segmentation over the banded matrix profile:
    (key, regime_idx, cac_min, n_win)."""
    spark = df.sparkSession
    return DataFrame(bridge(spark).matrixProfileFluss(
        df._jdf, series_key, time_col, value_col, int(window), int(band)), spark)
