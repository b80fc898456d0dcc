"""Product quantization (PQ) for embedding compression + ADC search —
the memory half of the IVF-PQ index family (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

At 100 TB an embedding column dominates storage: 1 B vectors × 64 float32
dims = 256 GB that every ANN scan must read. PQ splits each vector into
``m`` subvectors, k-means-quantizes each subspace to ``k`` centroids, and
stores only the m one-byte-ish codes (64× compression at m=8 over 64
float dims) plus an m×k codebook measured in kilobytes. Search uses
asymmetric distance computation (ADC): the query stays exact, a per-query
(m × k) table of subspace distances is built once against the codebook,
and each corpus vector's approximate distance is m table lookups — no
float vector is ever read at scan time.

Spark-first shape:

- **Training** runs all m subspace k-means in ONE distributed loop: the
  corpus explodes to (vec_id, sub, subvec) rows once per iteration,
  assignment is a broadcast join against the (m × k)-row codebook, and
  centroid recompute is the same posexplode/groupBy-avg as
  :func:`similarity.ivf_train` — shuffles keyed by (sub, code, dim),
  no vector data on the driver.
- **Encoding** is the assignment join + a pivot-free sort-collect to an
  ``array<int>`` of m codes per vector.
- **ADC search** broadcasts the per-query distance tables (built
  distributed, collected only as part of the broadcast relation) and
  evaluates ``aggregate(transform(codes, (c, i) -> tables[i][c]))`` —
  a whole-stage-codegen'd expression over the codes column; shuffle is
  the final per-query top-k only.

Distance space: squared L2 (the PQ-standard). For L2-normalized
embeddings L2 ranking equals cosine ranking, so recall is comparable to
the cosine operators; ADC values are approximations BY DESIGN — the
exactness contract (pinned in tests) is that ADC distance equals the
true squared L2 to the RECONSTRUCTED (quantized) vector, bit-for-bit
modulo float association.

Reference note: the reference repo has no vector search at all (SURVEY.md
§2 — absence); this extends the similarity-search surface
(``embed_knn_*``) with the compressed tier.

Operating points: SCALING.md's round-11 "IVF-PQ operating grid" records
recall@10 across (nprobe × overfetch) at 1× and 5× corpus — on
hard-random embeddings OVERFETCH is the dominant recall knob and the
documented default is nprobe=2, overfetch=5 (recall floor
property-pinned in tests/test_pq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "pq_reconstruct", "pq_adc_topk",
           "pq_search_rerank", "ivf_pq_search"]


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _subvectors(df: DataFrame, m: int, id_col: str, vec_col: str,
                dim: int) -> DataFrame:
    """(id, sub, subvec): one row per vector per subspace, built from a
    single static explode (no per-subspace scans). Asserts dim % m == 0
    here — the one shared entry point — so pq_encode / ADC search fail
    loudly on non-divisible dimensions instead of silently dropping the
    trailing dim % m dimensions (review-found)."""
    assert dim % m == 0, (dim, m)
    d_sub = dim // m
    parts = F.array(*[
        F.struct(F.lit(s).alias("sub"),
                 F.slice(F.col(vec_col).cast("array<double>"),
                         s * d_sub + 1, d_sub).alias("subvec"))
        for s in range(m)])
    return df.select(F.col(id_col), F.explode(parts).alias("p")) \
             .select(id_col, "p.sub", "p.subvec")


def pq_train(corpus: DataFrame, m: int = 8, k: int = 16, n_iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None, avg_fn=None) -> DataFrame:
    """Learn the (sub, code, centroid) codebook: independent k-means per
    subspace, all m run in the same distributed Lloyd loop.

    Deterministic init (the ivf_train discipline): subspace s's initial
    centroids are the subvectors of the k smallest ids. Returns
    (sub int, code int, centroid array<double>) — m × k rows, kilobytes
    at any corpus size.

    ``avg_fn`` overrides the centroid-mean aggregate (default ``F.avg``,
    whose double sum is partition-order dependent at the last ulp). The
    oracle-checked contract query passes ``determinism.dec_avg`` so the
    recomputed centroids are bit-identical cross-engine — same knob the
    IVF contract queries use."""
    if avg_fn is None:
        avg_fn = F.avg
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    sv = _subvectors(corpus, m, id_col, vec_col, dim)
    wn = Window.partitionBy("sub").orderBy(id_col)
    codebook = (sv.withColumn("rn", F.row_number().over(wn))
                .filter(F.col("rn") <= k)
                .select("sub", (F.col("rn") - 1).cast("int").alias("code"),
                        F.col("subvec").alias("centroid")))
    for _ in range(n_iters):
        assigned = _assign(sv, codebook)
        codebook = (assigned
                    .select("sub", "code",
                            F.posexplode("subvec").alias("dim", "val"))
                    .groupBy("sub", "code", "dim")
                    .agg(avg_fn(F.col("val")).alias("mean"))
                    .groupBy("sub", "code")
                    .agg(F.array_sort(F.collect_list(
                        F.struct("dim", "mean"))).alias("dm"))
                    .select("sub", "code",
                            F.transform("dm", lambda s: s["mean"])
                             .alias("centroid")))
    # DENSIFY code ids (review-found): an empty cluster drops out of the
    # recompute, leaving a GAP in the code values — and ADC looks
    # distances up by POSITION in the per-sub table, so code values must
    # be exactly 0..len-1 per subspace or every code past the gap reads
    # its neighbor's distance (or NULL).
    wd = Window.partitionBy("sub").orderBy("code")
    return codebook.withColumn(
        "code", (F.row_number().over(wd) - 1).cast("int"))


def _assign(sv: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest-centroid assignment per (id, sub): broadcast join on sub
    (k rows per subspace), rank by rounded distance with code tiebreak —
    the ivf_assign determinism discipline."""
    id_col = sv.columns[0]
    d = _l2sq(F.col("subvec"), F.col("centroid"))
    w = Window.partitionBy(id_col, "sub").orderBy(
        F.round(d, 9).asc(), F.col("code"))
    return (sv.join(F.broadcast(codebook), "sub")
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select(id_col, "sub", "code", "subvec"))


def pq_encode(corpus: DataFrame, codebook: DataFrame, m: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int | None = None) -> DataFrame:
    """(id, codes array<int>) — the compressed corpus: m small ints per
    vector (one byte each at k ≤ 256 in any columnar encoding).

    Zero-shuffle encode (round 17 — found by the ANN scale decade): the
    codebook is m x k rows of d/m-dim centroids, KILOBYTES by contract,
    so it is collected once and broadcast inside an Arrow-batched
    ``mapInPandas`` kernel — each batch computes all (row, sub, code)
    distances as one numpy (B, m, k) tensor and argmins per subspace,
    the same dense-numerics pattern as ``similarity.cosine_topk_blas``.
    Tie discipline matches the training ranker exactly: distances
    accumulated dimension-SEQUENTIALLY in doubles (the fold order of
    ``_l2sq``), rounded to 9 decimals, ``argmin`` returning the FIRST
    (= lowest-code, codebook embedded in densified code order) minimum.

    Why not the previous DataFrame plan: explode to n*m rows,
    broadcast-join x k codes, row_number window over n*m*k rows,
    groupBy back — 102M window-sorted rows at the decade's 100x point
    (200k vectors, m=16, k=32), executor time growing 13.5x per 10x.
    And why not a literal-expression projection: m*k embedded array
    literals build an expression tree past the JIT method limit and
    the projection deoptimizes to interpreted eval (measured slower
    than the window plan). The Arrow kernel touches each vector once,
    shuffles nothing, and the codebook rides the closure (KBs).
    Value parity is pinned against the oracle's bit-exact SQL replay
    and the operator tests. Training keeps the DataFrame-side
    :func:`_assign` — its codebook evolves per Lloyd iteration, and
    training runs on a bounded sample by contract."""
    import numpy as np

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    assert dim % m == 0, (dim, m)
    d_sub = dim // m
    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebook.collect():   # m x k rows — kilobytes by contract
        by_sub.setdefault(r["sub"], []).append((r["code"], r["centroid"]))
    assert sorted(by_sub) == list(range(m)), sorted(by_sub)
    k = len(by_sub[0])
    cb = np.zeros((m, k, d_sub), dtype=np.float64)
    for s in range(m):
        cents = [c for _, c in sorted(by_sub[s])]  # densified: 0..k-1
        assert len(cents) == k, (s, len(cents), k)
        cb[s] = np.asarray(cents, dtype=np.float64)

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, codes array<int>"

    def encode_batches(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            xs = x.reshape(len(pdf), m, d_sub)
            dist = np.zeros((len(pdf), m, k), dtype=np.float64)
            for j in range(d_sub):   # dimension-sequential: _l2sq's fold
                diff = xs[:, :, None, j] - cb[None, :, :, j]
                dist += diff * diff
            codes = np.round(dist, 9).argmin(axis=2)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "codes": [c.astype("int32").tolist() for c in codes]})

    return (corpus.select(id_col, vec_col)
            .mapInPandas(encode_batches, out_schema))


def pq_reconstruct(codes: DataFrame, codebook: DataFrame,
                   id_col: str = "vec_id") -> DataFrame:
    """(id, vec) — decode codes back to the quantized vectors (test /
    debugging tier; production search never materializes this)."""
    ex = codes.select(id_col, F.posexplode("codes").alias("sub", "code"))
    joined = ex.join(F.broadcast(codebook), ["sub", "code"])
    return (joined.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(
                F.struct("sub", "centroid"))).alias("sc"))
            .select(id_col,
                    F.flatten(F.transform("sc", lambda s: s["centroid"]))
                     .alias("vec")))




def _query_tables(queries: DataFrame, codebook: DataFrame, m: int,
                  dim: int, id_col: str, vec_col: str) -> DataFrame:
    """(query_id, tables array<array<double>>): per-query ADC distance
    tables, position-aligned with the codebook's DENSE code ids (see
    pq_train — the lookup is positional)."""
    sv = _subvectors(queries, m, id_col, vec_col, dim)
    tbl = (sv.join(F.broadcast(codebook), "sub")
           .select(F.col(id_col).alias("query_id"), "sub", "code",
                   _l2sq(F.col("subvec"), F.col("centroid")).alias("d2")))
    return (tbl.groupBy("query_id", "sub")
            .agg(F.array_sort(F.collect_list(
                F.struct("code", "d2"))).alias("cd"))
            .select("query_id", "sub",
                    F.transform("cd", lambda s: s["d2"]).alias("row"))
            .groupBy("query_id")
            .agg(F.array_sort(F.collect_list(
                F.struct("sub", "row"))).alias("sr"))
            .select("query_id",
                    F.transform("sr", lambda s: s["row"])
                     .alias("tables")))


def _exact_rerank(short: DataFrame, queries: DataFrame, corpus: DataFrame,
                  k: int, id_col: str, vec_col: str) -> DataFrame:
    """Exact squared-L2 rerank of a (query_id, neighbor_id) shortlist —
    RANK top-k on the true distance."""
    qs = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("q"))
    cs = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("c"))
    exact = (short.select("query_id", "neighbor_id")
             .join(cs, "neighbor_id")
             .join(F.broadcast(qs), "query_id")
             .select("query_id", "neighbor_id",
                     _l2sq(F.col("q"), F.col("c")).alias("dist")))
    w = Window.partitionBy("query_id").orderBy(
        F.round("dist", 9).asc_nulls_last(), F.col("neighbor_id"))
    return (exact.withColumn("rk", F.rank().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id",
                    F.round("dist", 6).alias("dist")))


def pq_adc_topk(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
                k: int, m: int = 8, n_codes: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_dist),
    RANK semantics on the rounded distance (ties all kept, the
    ``cosine_topk_hof`` discipline).

    The per-query distance tables are built DISTRIBUTED (queries ×
    broadcast codebook → (query, sub, code, d2) → collected into an
    array<array<double>> per query row) and then broadcast against the
    codes relation; the scan-side work per corpus row is
    ``aggregate(transform(codes, (c, i) -> tables[i][c]))`` — m array
    lookups, no float vectors touched."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    tables = _query_tables(queries, codebook, m, dim, id_col, vec_col)
    c = codes.select(F.col(id_col).alias("neighbor_id"), "codes")
    dist = F.aggregate(
        F.transform("codes",
                    lambda code, i: F.get(F.get("tables", i), code)),
        F.lit(0.0), lambda acc, v: acc + v)
    sims = (c.join(F.broadcast(tables),
                   F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", dist.alias("adc_dist")))
    # nulls LAST defensively: a NULL distance must never outrank a real
    # one (NULLs would otherwise poison the whole top-k under asc())
    w = Window.partitionBy("query_id").orderBy(
        F.round("adc_dist", 9).asc_nulls_last(), F.col("neighbor_id"))
    return (sims.withColumn("rk", F.rank().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id",
                    F.round("adc_dist", 6).alias("adc_dist")))


def pq_search_rerank(queries: DataFrame, codes: DataFrame,
                     codebook: DataFrame, corpus: DataFrame, k: int,
                     overfetch: int = 5, m: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dim: int | None = None) -> DataFrame:
    """Two-stage PQ search — the production shape: ADC over the
    compressed codes shortlists ``k × overfetch`` candidates per query
    (cheap scan, no float vectors), then ONLY the shortlist joins back to
    the raw embeddings for exact squared-L2 rerank. Returns
    (query_id, neighbor_id, dist) — exact distances, RANK top-k.

    Recall equals the shortlist's containment of the true top-k (raise
    ``overfetch`` or codebook resolution to trade scan cost for recall);
    everything the shortlist contains is ordered EXACTLY. At 100 TB the
    rerank join touches ``queries × k × overfetch`` corpus rows — an
    equi-join on ids against a shortlist that is many orders of magnitude
    smaller than the corpus."""
    short = pq_adc_topk(queries, codes, codebook, k * overfetch, m=m,
                        id_col=id_col, vec_col=vec_col, dim=dim)
    return _exact_rerank(short, queries, corpus, k, id_col, vec_col)


def ivf_pq_search(queries: DataFrame, assigned_codes: DataFrame,
                  centroids: DataFrame, codebook: DataFrame,
                  corpus: DataFrame, k: int, nprobe: int = 2,
                  overfetch: int = 5, m: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int | None = None) -> DataFrame:
    """The composed 100 TB search shape: IVF bounds WHICH vectors a query
    touches (codes restricted to the query's ``nprobe`` nearest cells),
    PQ-ADC bounds the BYTES per touched vector, and the exact rerank
    bounds the error — ``similarity.ivf_search``'s cell-restricted
    equi-join with the scan side reading codes instead of float vectors.

    ``assigned_codes``: (id, cell, codes) — ``similarity.ivf_assign``
    output joined with :func:`pq_encode` (built once at index time).
    ``centroids``: the IVF cell centroids; ``codebook``: the PQ codebook;
    ``corpus``: raw embeddings, touched ONLY by the shortlist rerank.

    With ``nprobe`` ≥ the cell count this degrades gracefully to plain
    ADC-over-everything + rerank (pinned in tests); at production cell
    counts the scan cost is corpus/n_cells × nprobe rows × m byte
    lookups.

    Operating guidance (round 17, measured by the ANN scale decade in
    SCALING.md): at a FIXED codebook, recall@k degrades as the corpus
    densifies — quantization error is constant while true-neighbor
    distance gaps shrink — and the remedy is ``overfetch``, which is
    measured nearly FREE here (the ADC code scan dominates; the
    widened exact rerank is k × overfetch float rows per query). At
    the decade's 100× point recall@10 went 0.28 → 0.91 from overfetch
    2 → 50 at flat search wall. Scale ``overfetch`` with corpus
    density (or retrain a larger codebook); raise ``nprobe`` only when
    candidate COVERAGE (the IVF leg's recall) is the deficit."""
    from .similarity import cosine_similarity  # re-exported there

    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    sim = cosine_similarity(F.col(vec_col), F.col("centroid"))
    w = Window.partitionBy(id_col).orderBy(F.desc(F.round(sim, 9)), "cell")
    probes = (queries.crossJoin(F.broadcast(centroids))
              .withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= nprobe)
              .select(F.col(id_col).alias("query_id"), "cell"))

    tables = _query_tables(queries, codebook, m, dim, id_col, vec_col)
    probe_tables = probes.join(tables, "query_id")

    c = assigned_codes.select(F.col(id_col).alias("neighbor_id"),
                              "cell", "codes")
    dist = F.aggregate(
        F.transform("codes",
                    lambda code, i: F.get(F.get("tables", i), code)),
        F.lit(0.0), lambda acc, v: acc + v)
    short = (c.join(F.broadcast(probe_tables), "cell")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", dist.alias("adc_dist")))
    sw = Window.partitionBy("query_id").orderBy(
        F.round("adc_dist", 9).asc_nulls_last(), F.col("neighbor_id"))
    short = (short.withColumn("rk", F.rank().over(sw))
             .filter(F.col("rk") <= k * overfetch)
             .select("query_id", "neighbor_id")
             # a vector in 2+ probed cells must rerank once, not twice
             .distinct())

    return _exact_rerank(short, queries, corpus, k, id_col, vec_col)
