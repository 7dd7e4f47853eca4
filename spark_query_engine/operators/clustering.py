"""Distributed k-means (Lloyd's) over embedding columns, and the two
operators it unlocks: SemDeDup-style semantic dedup and a
learned-codebook IVF probe.

This is the codebook trainer the IVF family was missing
(``similarity.ivf_assign`` uses an id<k stand-in): each Lloyd
iteration is one broadcast-join assignment pass plus one
(cluster, dim)-keyed mean — both shapes that scale linearly. Centroids
are k·dim floats of MODEL state, so they round-trip through the driver
between iterations exactly like Spark ML's own KMeans (and like the
``_query_vec`` parameter fetch) — never the data plane.

Determinism discipline (the whole family is exact-oracle checkable):
init = the vectors with id < k; every centroid element is the 6dp-
rounded mean of its members; every similarity is 6dp-rounded before
ranking with centroid id as the tiebreak. A DuckDB oracle unrolling
the same iterations reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_query_engine.operators import widen
from spark_query_engine.operators.dedup import cosine


def _vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return widen(df).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )


def assign_to_centroids(
    v: DataFrame,
    centroids: list[list[float]],
    n_hint: int | None = None,
) -> DataFrame:
    """One assignment pass: nearest centroid by 6dp-rounded cosine
    (ties → lowest centroid id). Returns (id, vec, centroid, cent_sim).

    Substrate (round 8): the Θ(n·k·d) distance work runs as an
    Arrow-batched numpy GEMM — the ``cosine_pairs_exact`` tile-kernel
    call the round-7 verdict prescribed — instead of per-centroid
    interpreted ``F.transform`` folds. With SemDeDup's k ∝ n the scan
    is n²·d/64 by definition; at interpreted-expression rates that was
    the repo's last quadratic-in-the-interpreter substrate, at BLAS
    rates it is the flop floor. Exactness is preserved by the GEMM-
    prefilter-then-exact-verify contract: per row, every centroid
    whose BLAS cosine sits within 2e-6 of the row maximum is a
    CANDIDATE (|BLAS − sequential fold| ≤ ~1e-12 and two 6dp-rounded
    values can tie only within 1e-6, so every possible argmax/tie
    participant is provably captured with ~500× margin); the emitted
    ``centroid``/``cent_sim`` then derive from the SAME 6dp-rounded
    engine-exact sequential folds as before, evaluated only for the
    ~1 candidate per row. Rows whose own norm is 0 — and zero-norm
    centroid columns — fall back to candidates=ALL, so the NaN
    ordering semantics of the old full-expression argmax are
    reproduced bit-for-bit in every degenerate case.

    Plan: one mapInPandas over the (already widened/persisted) vector
    relation — Arrow batches in, (id, vec, cands) out, no shuffle —
    then one BroadcastNestedLoopJoin against the 1-row codebook
    relation (the ``cp_keys`` pattern; an ``F.lit`` codebook literal
    costs ~0.7 ms/element of py4j, measured 9 s at k·d = 313·64) and
    a single projection for the exact verify. The codebook rides to
    the Python workers via task closure — k·d floats of model state,
    kilobytes.

    Crossover (measured at d=64): the GEMM pays a fixed ~0.3-0.5 s of
    Python-stage spin-up + Arrow round-trip per pass (3 passes per
    kmeans_assign) while the interpreted folds run at roughly 1e8
    mult-adds/s — so the scan dispatches on total WORK, n·k·d ≥ 1e8
    (``n_hint`` from the caller's parquet footer / count; unknown n →
    expression path, which every fixed-small-k consumer wants anyway).
    Small fixed-k consumers (corpus_kmeans et al., k=8: n·k·d ≈ 1e7
    even at sf1) keep the pure-JVM expression plan; the GEMM takes
    over exactly where the round-7 verdict's defect lives — the
    k ∝ n scans (semdedup, cascade stage 3: n·k·d = n²·d/64 crosses
    1e8 near n ≈ 10⁴, i.e. between sf0.1 and sf0.3), where it
    measured semdedup sf1 12.6 → 4.8 s and flattened the sf-exponent
    to ~0.04. Both substrates emit bit-identical results (the
    exact-verify contract above), so the dispatch is a pure cost
    decision — and both are pytest-asserted equal on a forced-GEMM
    corpus."""
    dim = len(centroids[0]) if centroids else 0
    if n_hint is None or n_hint * len(centroids) * dim < 1e8:
        return _assign_expr(v, centroids)
    import numpy as np

    spark = v.sparkSession
    cmat = np.asarray(
        [[float(x) for x in c] for c in centroids], dtype=np.float64
    )
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    zero_cent = cnorm == 0.0
    cnorm = np.where(zero_cent, np.inf, cnorm)
    k = cmat.shape[0]

    def _candidates(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["vec"]])
            nv = np.sqrt((V * V).sum(axis=1))
            bad = nv == 0.0
            nv = np.where(bad, np.inf, nv)
            S = (V @ cmat.T) / (nv[:, None] * cnorm[None, :])
            mask = S >= (S.max(axis=1)[:, None] - 2e-6)
            # degenerate rows/centroids: exact-verify against ALL
            # centroids so NaN-ordering semantics replay engine-side
            mask[bad, :] = True
            mask[:, zero_cent] = True
            ii, jj = np.nonzero(mask)
            splits = np.searchsorted(ii, np.arange(1, len(pdf)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "vec": pdf["vec"],
                    "cands": np.split(jj.astype(np.int32), splits),
                }
            )

    cand = v.mapInPandas(
        _candidates, "id long, vec array<double>, cands array<int>"
    )
    cdf = F.broadcast(
        spark.createDataFrame(
            [([list(map(float, c)) for c in centroids],)],
            "cents array<array<double>>",
        )
    )
    sims = F.transform(
        F.col("cands"),
        lambda c: F.round(
            cosine(F.col("vec"), F.element_at(F.col("cents"), c + 1)), 6
        ),
    )
    best = F.element_at(
        F.col("cands"), F.array_position(sims, F.array_max(sims)).cast("int")
    ).cast("int")
    return cand.crossJoin(cdf).select(
        "id",
        "vec",
        best.alias("centroid"),
        F.array_max(sims).alias("cent_sim"),
    )


def _assign_expr(v: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Small-k assignment substrate: the codebook ships as a BROADCAST
    1-row relation (never an ``F.lit`` nested-list literal — that
    costs ~0.7 ms/element of py4j) into one
    BroadcastNestedLoopJoin(BuildRight, Cross) and the argmax is a
    single projection of per-centroid 6dp-rounded cosine folds — zero
    shuffle, zero Python. Interpreted higher-order-function rates make
    this the wrong substrate past k ≈ 32 (see the GEMM dispatch in
    ``assign_to_centroids``)."""
    spark = v.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [([list(map(float, c)) for c in centroids],)],
            "cents array<array<double>>",
        )
    )
    sims = F.transform(
        F.col("cents"), lambda c: F.round(cosine(F.col("vec"), c), 6)
    )
    best = F.array_position(sims, F.array_max(sims)).cast("int") - 1
    return v.crossJoin(cdf).select(
        "id",
        "vec",
        best.alias("centroid"),
        F.array_max(sims).alias("cent_sim"),
    )


def kmeans_fit(
    spark: SparkSession,
    v: DataFrame,
    k: int = 8,
    iters: int = 2,
    n_hint: int | None = None,
    seeds: list | None = None,
    fit_frac: float | None = None,
) -> list[list[float]]:
    """Lloyd's iterations; returns the learned centroids (k·dim floats
    of model state). Init = vectors with id < k. Each iteration:
    assignment (map-side, broadcast literal centroids) → per-(cluster,
    dim) mean via posexplode + hash aggregation (map-side combine;
    k·dim output rows) → 6dp round → driver fetch for the next literal.
    Empty clusters keep their previous centroid.

    ``seeds``: pre-collected (id, vec) rows covering at least
    id < k — callers that already fetched a model-state head slice
    (query vector, PQ codebook seeds) pass it through so the init
    does not pay a second collect job (r8 fit-constant shave).

    ``fit_frac``: sample-capped fit — the FAISS
    ``max_points_per_centroid`` discipline for true corpus scale.
    When set (0 < fit_frac < 1), the Lloyd ITERATIONS train on the
    deterministic md5-fraction sample ``frac("kmfit:" || id) <
    fit_frac`` (seeds id < k always included, so the init contract
    holds); any final full-corpus assignment is the CALLER's pass and
    is unaffected in shape. Replayable exactly in SQL with the same
    md5 expression. Deliberately NOT wired into the registered
    queries: at the bench scales the fit is driver-round-trip bound,
    not scan bound — a 50% cap measured 2.11 → 1.91 s on the sf0.1 PQ
    trainer while merging the driver jobs (the shave actually
    registered) took 6.0 → 4.8 s — so the knob exists for the 100 TB
    deployment where the iteration scans DO dominate (cap ≈ 256·k
    rows), documented in SCALING.md round 8."""
    v = v.persist()
    if fit_frac is not None and not (0.0 < fit_frac <= 1.0):
        raise ValueError(f"fit_frac must be in (0, 1], got {fit_frac}")
    fit_v = v
    if fit_frac is not None and fit_frac < 1.0:
        coin = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("kmfit"), F.col("id"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
        )
        fit_v = v.where((F.col("id") < k) | (coin < F.lit(float(fit_frac))))
    seed_rows = (
        [r for r in seeds if int(r["id"]) < k]
        if seeds is not None
        else v.where(F.col("id") < k).collect()
    )
    cents = {
        int(r["id"]): [round(float(x), 6) for x in r["vec"]]
        for r in seed_rows
    }
    for _ in range(iters):
        assigned = assign_to_centroids(
            fit_v, [cents[i] for i in sorted(cents)], n_hint=n_hint
        )
        means = (
            assigned.select("centroid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("centroid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("val"))
            .groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("cvec")
            )
        )
        for r in means.collect():
            cents[int(r["centroid"])] = [float(x) for x in r["cvec"]]
    return [cents[i] for i in sorted(cents)]


def kmeans_assign(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    n_hint: int | None = None,
) -> DataFrame:
    """Fit + final assignment: (id, vec, centroid, cent_sim)."""
    from spark_query_engine.operators import release_on_drop

    v = _vectors(df, id_col, vec_col)
    cents = kmeans_fit(spark, v, k=k, iters=iters, n_hint=n_hint)
    # v was persisted inside kmeans_fit and still backs the lazy
    # assignment scan — release it when the caller drops the result
    return release_on_drop(assign_to_centroids(v, cents, n_hint=n_hint), v)


def covariance_matrix(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Distributed covariance matrix of an embedding column — the input
    relation of classical distributed PCA (covariance here, eigen-
    decomposition on the driver: a d×d float problem, model state not
    data). Upper triangle only: (i, j, cov) with 1-based i ≤ j,
    cov ≈ (Σxy − ΣxΣy/n)/n on 1e-6-quantized elements, 6dp-rounded.

    Float discipline (the repo's exact-integer-moment rule, adopted
    round 3 after built-in stddev diverged cross-engine): elements
    quantize to 1e6-scaled BIGINTs via FLOOR (deterministic on
    identical doubles), the raw moments Σxq·yq, Σxq, Σyq accumulate
    EXACTLY as decimal(38,0) integers — order-independent, so Spark's
    partition-order float summation can never flip a 6dp rounding
    boundary (the round-4 vec_covariance_matrix hash flip) — and the
    covariance derives once per output cell from identical integers
    on both engines.

    Plan (r11): the upper-triangle products are generated PER ROW with
    nested higher-order transforms over the quantized element array —
    no element self-join, so nothing shuffles before the (i, j)-keyed
    hash agg's own tiny exchange (the r10 plan shuffled the n·d element
    relation twice to equi-join it with itself on id). n·d(d+1)/2
    product rows flow scan → explode → map-side combine (≤ d(d+1)/2
    groups per partition). The per-row product xq·yq stays a BIGINT
    (exact while |element| < ~3e3, i.e. |xq| < ~3e9 — embeddings are
    unit-scale); r12: that bound is now ENFORCED — the marginal agg
    carries max|xq| per dimension and the output projection raises
    beyond it, so out-of-domain inputs fail loudly instead of wrapping
    silently. The cross-row SUM widens to decimal(38,0) exactly as
    before, so the integer moments are unchanged at any n. One d-row
    marginal agg joins back on i/j. Linear in n; d² is the OUTPUT
    size, constant per corpus."""
    v = _vectors(df, id_col, vec_col)
    n = v.count()
    xq_arr = F.transform(F.col("vec"), lambda x: F.floor(x * F.lit(1000000.0)))
    d_len = F.size(F.col("vec"))
    tri = F.flatten(
        F.transform(
            xq_arr,
            lambda x, i: F.transform(
                F.slice(xq_arr, i + 1, d_len - i),
                lambda y, jo: F.struct(
                    (i + 1).alias("i"),
                    (i + jo + 1).alias("j"),
                    (x * y).alias("p"),
                ),
            ),
        )
    )
    sxy = (
        v.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(
            # Cast before the cross-row SUM widens to decimal(38,0):
            # the per-row BIGINT product cannot wrap for unit-scale
            # elements (see docstring bound), and the decimal SUM is
            # exact at any row count — same integers the r10 operand-
            # widened form produced; the DuckDB oracle widens the same
            # way to HUGEINT.
            F.sum(F.col("t.p").cast("decimal(38,0)")).alias("s_xy")
        )
    )
    el = v.select(F.posexplode(xq_arr).alias("i0", "xq"))
    marg = el.groupBy((F.col("i0") + 1).alias("i")).agg(
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("s"),
        # r12 (r11 verdict task 4): enforce the docstring's BIGINT
        # product bound at runtime. Piggybacks on the marginal agg
        # (already scans every element — no extra pass); the final
        # projection raises if ANY dimension's max |xq| reaches the
        # exact-product domain edge, so out-of-domain vectors fail
        # loudly instead of wrapping silently.
        F.max(F.abs(F.col("xq"))).alias("mx"),
    )
    nn = float(n)
    # |xq·yq| stays below 2^63 (~9.22e18) while both operands stay
    # below 3.0e9 (elements < ~3e3 after the 1e6 quantization); every
    # index appears as i in its own (i, i) output row, so checking the
    # joined i- and j-side maxes covers every element of every vector.
    _lim = 3_000_000_000
    _guard = (F.col("mx_x") < _lim) & (F.col("mx_y") < _lim)
    _err = F.raise_error(
        F.lit(
            "covariance_matrix: element magnitude exceeds the exact "
            "BIGINT product domain (|element| must be < ~3.0e3 after "
            "1e-6 quantization); widen the per-row product to decimal"
        )
    ).cast("double")
    return (
        sxy.join(
            F.broadcast(
                marg.select(
                    F.col("i"),
                    F.col("s").alias("s_x"),
                    F.col("mx").alias("mx_x"),
                )
            ),
            "i",
        )
        .join(
            F.broadcast(
                marg.select(
                    F.col("i").alias("j"),
                    F.col("s").alias("s_y"),
                    F.col("mx").alias("mx_y"),
                )
            ),
            "j",
        )
        .select(
            "i",
            "j",
            # + 0.0 normalizes IEEE signed zero: DuckDB's ROUND keeps
            # -0.0 for tiny negative covariances while Spark's
            # BigDecimal round emits +0.0; values compare equal but a
            # bit-pattern hash distinguishes them. -0.0 + 0.0 = +0.0
            # on both engines, so the two sides now agree bitwise.
            F.when(~_guard, _err)
            .otherwise(
                F.round(
                    (
                        F.col("s_xy").cast("double")
                        - F.col("s_x").cast("double")
                        * F.col("s_y").cast("double")
                        / F.lit(nn)
                    )
                    / F.lit(nn * 1e12),
                    6,
                )
                + F.lit(0.0)
            )
            .alias("cov"),
        )
    )


def _rnd_half_away(x: float) -> int:
    """ROUND to nearest integer, halves away from zero — the rounding
    both DuckDB's ROUND and Spark's HALF_UP implement, mirrored here
    so driver-side arithmetic replays engine-side expressions."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def pca_power_basis(
    cov_rows: list[dict], d: int, iters: int = 8
) -> tuple[list[int], list[int]]:
    """Top-2 PCA basis from the covariance relation via EXACT-INTEGER
    power iteration with rank-1 deflation — step 2 of classical
    distributed PCA, formulated so a SQL oracle replays it term for
    term (no SQL engine ships an eigensolver, but every engine can
    do exact integer mat-vec products and one float division per
    step).

    Arithmetic contract (mirrored by the ``vec_pca_project`` oracle
    CTEs): covariance cells quantize to 1e6-scaled BIGINTs; each
    iteration computes w = C·v exactly in integers, then rescales
    v ← ROUND(w·1e6 / max|w|) — the only float ops are one cast, one
    multiply, one divide per component, identical IEEE sequences on
    both engines; deflation subtracts the integer-quantized rank-1
    Rayleigh term. Fully deterministic: no summation-order float
    accumulation anywhere.

    This is d×d driver-side MODEL state (the kmeans_fit contract).
    Note the spectrum caveat: on near-isotropic input (this corpus's
    iid unit vectors — see vec_covariance_matrix) the eigengap is
    tiny and ``iters`` rounds land near the start direction; the
    eigen-contract itself (projected variance = eigenvalue) is
    certified by the numpy-eigh pytest property
    (test_distributed_pca_projection), while THIS path certifies the
    distributed chain end-to-end by hash."""
    cq = [[0] * d for _ in range(d)]
    for r in cov_rows:
        q = _rnd_half_away(r["cov"] * 1000000.0)
        cq[r["i"] - 1][r["j"] - 1] = q
        cq[r["j"] - 1][r["i"] - 1] = q

    def power(c: list[list[int]]) -> list[int]:
        v = [1000000] * d
        for _ in range(iters):
            w = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
            m = max(abs(x) for x in w)
            v = [_rnd_half_away(float(x) * 1000000.0 / float(m)) for x in w]
        return v

    v1 = power(cq)
    num = sum(cq[i][j] * v1[i] * v1[j] for i in range(d) for j in range(d))
    den = sum(x * x for x in v1)
    c2 = [
        [
            cq[i][j]
            - _rnd_half_away(
                float(num)
                / float(den)
                / float(den)
                * float(v1[i])
                * float(v1[j])
            )
            for j in range(d)
        ]
        for i in range(d)
    ]
    v2 = power(c2)
    return v1, v2


def semantic_dedup(
    assigned: DataFrame, threshold: float
) -> DataFrame:
    """SemDeDup decision pass: within each k-means cluster, compare all
    member pairs by exact cosine; a document is PRUNED when a more-
    senior member (lower id) sits within ``threshold`` similarity.

    The cluster key is what makes this scale: pair cost drops from
    O(n²) to O(Σ|cluster|²) ≈ O(n²/k) — and the clusters shuffle-
    partition independently, so k is the parallelism knob. The pair
    join is an equi-join on ``centroid`` (hash-partitioned, never a
    cartesian of the corpus). Returns (id, centroid, is_kept)."""
    a = assigned.select(
        F.col("centroid"), F.col("id").alias("id_a"), F.col("vec").alias("vec_a")
    )
    b = assigned.select(
        F.col("centroid"), F.col("id").alias("id_b"), F.col("vec").alias("vec_b")
    )
    pruned = (
        a.join(b, "centroid")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6) >= threshold)
        .select("id_b")
        .distinct()
    )
    return (
        assigned.join(pruned, assigned.id == pruned.id_b, "left")
        .select(
            "id",
            "centroid",
            F.col("id_b").isNull().alias("is_kept"),
        )
    )


def kmeans_parallel_init(
    spark: SparkSession,
    v: DataFrame,
    k: int,
    rounds: int = 3,
    l: int = 16,
) -> DataFrame:
    """k-means|| initialization (Bahmani et al., VLDB'12) — the
    SCALABLE replacement for both random init and sequential
    k-means++: instead of k strictly sequential center draws, run
    ``rounds`` oversampling passes that each select ~``l`` points with
    probability l·d²(x,C)/φ, then weight the candidates by how many
    points they serve and keep the top ``k`` (the deterministic
    weighted-top-k variant of the final re-clustering step).

    Determinism discipline (every stochastic piece replayable by a
    SQL oracle): the seed center is id 0; the 'coin flip' is the md5
    fraction of ``kpp:<round>:<id>`` (the repo's standard md5-uniform
    trick); per-point distances are 6dp-rounded squared L2 then
    1e6-quantized to BIGINT so the potential φ = Σ d² is an EXACT
    integer sum (the selection threshold l·d²/φ is then one fixed
    IEEE expression over identical integers on both engines).

    Scale: per round — ONE job: a broadcast-center distance scan
    (centers are driver model state, like ``assign_to_centroids``)
    whose exact-integer φ aggregate rides back in as a broadcast
    1-row relation feeding the coin-flip filter, collecting ~l rows.
    Nothing all-pairs, nothing shuffled but the aggregates; candidate
    count is 1 + rounds·l regardless of corpus size. Driver round-
    trips are bounded scalars/center rows (the kmeans_fit contract):
    one head collect (seed + naive-audit centers), one merged job per
    round, one candidate-weights collect — the final φ audit is a
    LAZY branch of the returned plan, paid once by the consumer's
    action (r8: this was 10 driver-synchronized jobs, now 5).

    Output: (center_id, round_added, weight, rk) for the k chosen
    centers plus audit columns — n_candidates and phi_ratio_naive =
    φ(naive id<k init) / φ(k-means|| init), the measured quality gain
    of the algorithm (>1 means better-spread centers)."""
    v = v.select("id", "vec").persist()

    # centers ship as a broadcast 1-row relation per pass (the
    # assign_to_centroids round-7 pattern): F.lit's element-by-element
    # py4j construction costs ~0.7 ms/element, paid once per ROUND on
    # a growing center list — createDataFrame batch-pickles the same
    # payload in milliseconds
    def with_centers(df: DataFrame, center_vecs, center_ids=None):
        if center_ids is None:
            row, schema = ([
                [float(x) for x in c] for c in center_vecs
            ],), "cents array<array<double>>"
        else:
            row, schema = (
                [[float(x) for x in c] for c in center_vecs],
                [int(i) for i in center_ids],
            ), "cents array<array<double>>, cids array<bigint>"
        return df.crossJoin(
            F.broadcast(spark.createDataFrame([row], schema))
        )

    def d2_expr():
        return F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("vec"), c, lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, e: acc + e,
                    ),
                    6,
                ),
            )
        )

    def frac(r: int):
        return F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("kpp"), F.lit(str(r)), F.col("id"))), 1, 8),
            16,
            10,
        ).cast("double") / F.lit(4294967296.0)

    # ONE head collect serves both the seed (id 0) and the naive-init
    # audit list (id < k) — these were two separate jobs (r8 fit-
    # constant shave; k head rows are model state, not data plane)
    head = v.where(F.col("id") < k).orderBy("id").collect()
    seed = [r for r in head if int(r["id"]) == 0]
    if not seed:
        raise ValueError(
            "kmeans_parallel_init seeds from the row with id 0 "
            "(deterministic stand-in for a uniform draw); the input's "
            "id column must include 0"
        )
    centers: list[tuple[int, list[float]]] = [
        (int(r["id"]), [float(x) for x in r["vec"]]) for r in seed
    ]
    added_round = {centers[0][0]: 0}
    for r in range(1, rounds + 1):
        d2q = F.round(d2_expr() * 1000000, 0).cast("bigint")
        scored = with_centers(v, [c for _cid, c in centers]).select(
            "id", "vec", d2q.alias("d2q")
        )
        # φ and the coin-flip selection in ONE job (r8 fit-constant
        # shave — was a φ collect plus a selection collect per round):
        # the exact-integer potential rides as a broadcast 1-row
        # aggregate and the threshold expression is UNCHANGED —
        # (l·d2q)/φ with φ cast bigint→double, the same IEEE ops the
        # two-job form evaluated against the collected literal — so
        # selections (and the oracle) are bit-identical.
        sel = (
            scored.crossJoin(
                F.broadcast(scored.agg(F.sum("d2q").alias("phi")))
            )
            .where(
                frac(r)
                < (F.lit(float(l)) * F.col("d2q").cast("double"))
                / F.col("phi").cast("double")
            )
            .collect()
        )
        for row in sorted(sel, key=lambda x: int(x["id"])):
            cid = int(row["id"])
            if cid not in added_round:
                centers.append((cid, [float(x) for x in row["vec"]]))
                added_round[cid] = r

    # weight candidates: points served (argmin via array_position, so
    # ties break to the FIRST candidate in (round_added, id) insertion
    # order — the oracle replays the same order)
    dists = F.transform(
        F.col("cents"),
        lambda c: F.round(
            F.aggregate(
                F.zip_with(F.col("vec"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            6,
        ),
    )
    nearest = with_centers(
        v, [c for _cid, c in centers], [cid for cid, _c in centers]
    ).select(
        F.element_at(
            F.col("cids"),
            F.array_position(dists, F.array_min(dists)).cast("int"),
        ).alias("center_id")
    )
    # ONE weights collect (≤ 1 + rounds·l rows of model state), then
    # the weighted top-k ranks in PYTHON — the previous plan ran the
    # nearest/weights scan TWICE (once for the chosen-set collect,
    # once again inside the consumer's action on the lazy ranked
    # relation) and paid a window job besides (r8 fit-constant shave).
    wrows = {
        int(r["center_id"]): int(r["weight"])
        for r in nearest.groupBy("center_id")
        .agg(F.count(F.lit(1)).alias("weight"))
        .collect()
    }
    order = sorted(
        ((cid, added_round[cid]) for cid, _c in centers),
        key=lambda t: (-wrows.get(t[0], 0), t[0]),
    )
    ranked_rows = [
        (cid, rnd, wrows.get(cid, 0), rk)
        for rk, (cid, rnd) in enumerate(order, start=1)
        if rk <= k
    ]
    ranked = spark.createDataFrame(
        ranked_rows,
        "center_id bigint, round_added int, weight bigint, rk int",
    )
    chosen = {cid for cid, _rnd, _w, _rk in ranked_rows}

    # Both audit potentials (naive id<k init vs k-means|| init) in ONE
    # scan (r8 fit-constant shave): the two center lists ride as two
    # columns of the same broadcast 1-row relation and the exact
    # integer sums come out of a single aggregate — this audit was two
    # full d²-fold passes, the query's largest remaining constant.
    naive = head

    def d2_min(cents_col: str):
        return F.array_min(
            F.transform(
                F.col(cents_col),
                lambda c: F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("vec"), c, lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, e: acc + e,
                    ),
                    6,
                ),
            )
        )

    both = spark.createDataFrame(
        [(
            [[float(x) for x in c] for cid, c in centers if cid in chosen],
            [[float(x) for x in r["vec"]] for r in naive],
        )],
        "cents_kpp array<array<double>>, cents_naive array<array<double>>",
    )
    qk = F.round(d2_min("cents_kpp") * 1000000, 0).cast("bigint")
    qn = F.round(d2_min("cents_naive") * 1000000, 0).cast("bigint")
    # DEFERRED: the audit scan stays a lazy branch of the returned
    # plan (no collect — the ratio derives from the same bigint→double
    # casts and ROUND the collected form used), so the consumer's one
    # action pays it exactly once instead of the operator paying a
    # collect AND the action re-running the lazy ranked relation.
    audit = (
        v.crossJoin(F.broadcast(both))
        .agg(F.sum(qk).alias("pk"), F.sum(qn).alias("pn"))
        .select(
            F.lit(len(centers)).cast("bigint").alias("n_candidates"),
            F.round(
                F.col("pn").cast("double") / F.col("pk").cast("double"),
                6,
            ).alias("phi_ratio_naive"),
        )
    )
    out = ranked.crossJoin(F.broadcast(audit))
    from spark_query_engine.operators import release_on_drop

    # v must stay cached until the consumer's action runs the deferred
    # audit branch; release_on_drop unpersists it when OUT is dropped.
    return release_on_drop(out, v)
