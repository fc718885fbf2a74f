"""Round-12 operators: q_tree3 (depth-3 exact Gini tree — VERDICT r11
#4) and the round's widenings. Oracle parity is auto-covered by
test_oracle_parity's registry sweep; these tests pin the semantics
against independent python references.
"""

from __future__ import annotations

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_tree3


def _best_split(rows, n0, p0, nb, pb):
    """Exhaustive python reference (same as round-11's tree2 test):
    rows = sorted distinct (score, cum_n, cum_p); a candidate needs
    0 < cum_n - n0 < nb."""
    best = None
    for score, cum_n, cum_p in rows:
        nl = cum_n - n0
        pl = cum_p - p0
        if nl <= 0 or nl >= nb:
            continue
        nr, pr = nb - nl, pb - pl
        key = (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
            nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
        )
        if best is None or (key, score) < best[:2]:
            best = (key, score, nl, pl, nr, pr)
    return best


def _cum_rows(duck):
    from fraud_detection_spark.operators.ml_metrics import SCORED_SQL

    cum = duck.execute(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT score, COUNT(*) AS cnt, SUM(label) AS pos "
        "FROM s GROUP BY score) "
        "SELECT score, SUM(cnt) OVER (ORDER BY score) AS cum_n, "
        "SUM(pos) OVER (ORDER BY score) AS cum_p FROM g ORDER BY score"
    ).fetchall()
    return [(float(s), int(cn), int(cp)) for s, cn, cp in cum]


def test_tree3_matches_python_reference(spark, sf_dir, duck):
    """Greedy depth-3 reference: root, both branches, then the best
    split inside each of the four depth-2 leaves — every pick compared
    on threshold and exact left counts; an unreachable/pure node must
    be ABSENT, not emitted with degenerate counts."""
    got = REGISTRY["q_tree3"].fn(spark, sf_dir).toPandas().set_index("node")
    rows = _cum_rows(duck)
    n, p = rows[-1][1], rows[-1][2]

    root = _best_split(rows, 0, 0, n, p)
    assert abs(got.loc["root", "threshold"] - root[1]) < 1e-12

    def check(tag, sub, n0, p0, nb, pb):
        best = _best_split(sub, n0, p0, nb, pb)
        if best is None:
            assert tag not in got.index, tag
        else:
            assert abs(got.loc[tag, "threshold"] - best[1]) < 1e-12, tag
            assert got.loc[tag, "n_left"] == best[2] - 0, tag
            assert got.loc[tag, "pos_left"] == best[3], tag
        return best

    t0 = root[1]
    lbest = check("left", [r for r in rows if r[0] < t0], 0, 0, root[2], root[3])
    rbest = check(
        "right", [r for r in rows if r[0] > t0], root[2], root[3], root[4], root[5]
    )
    if lbest is not None:
        t1 = lbest[1]
        # ll: base (0,0), totals = left pick's left counts; note the
        # reference's nl/pl are already branch-relative, so the
        # absolute offsets are n0 + nl
        check("ll", [r for r in rows if r[0] < t1], 0, 0, lbest[2], lbest[3])
        check(
            "lr",
            [r for r in rows if t1 < r[0] < t0],
            lbest[2],
            lbest[3],
            lbest[4],
            lbest[5],
        )
    else:
        assert "ll" not in got.index and "lr" not in got.index
    if rbest is not None:
        t2 = rbest[1]
        # right branch base is (root.n_left, root.pos_left); the right
        # pick's branch-relative left counts are rbest[2], rbest[3],
        # so rl's totals are those and rr's absolute base offsets are
        # root_left + right_left
        check(
            "rl",
            [r for r in rows if t0 < r[0] < t2],
            root[2],
            root[3],
            rbest[2],
            rbest[3],
        )
        check(
            "rr",
            [r for r in rows if r[0] > t2],
            root[2] + rbest[2],
            root[3] + rbest[3],
            rbest[4],
            rbest[5],
        )
    else:
        assert "rl" not in got.index and "rr" not in got.index


def test_tree3_prefix_is_tree2_and_bookkeeping(spark, sf_dir):
    """The first three nodes of q_tree3 ARE q_tree2 (same machinery,
    same argmins); every emitted node's gain >= 0; each leaf's branch
    total equals its parent's corresponding side count."""
    t3 = REGISTRY["q_tree3"].fn(spark, sf_dir).toPandas().set_index("node")
    t2 = REGISTRY["q_tree2"].fn(spark, sf_dir).toPandas().set_index("node")
    for node in t2.index:
        for col in t2.columns:
            assert t3.loc[node, col] == t2.loc[node, col], (node, col)
    assert (t3["gain"] >= -1e-12).all()
    pairs = {
        "ll": ("left", "n_left", "pos_left"),
        "lr": ("left", "n_right", "pos_right"),
        "rl": ("right", "n_left", "pos_left"),
        "rr": ("right", "n_right", "pos_right"),
    }
    for leaf, (parent, ncol, pcol) in pairs.items():
        if leaf in t3.index:
            assert parent in t3.index
            assert (
                t3.loc[leaf, "n_left"] + t3.loc[leaf, "n_right"]
                == t3.loc[parent, ncol]
            ), leaf
            assert (
                t3.loc[leaf, "pos_left"] + t3.loc[leaf, "pos_right"]
                == t3.loc[parent, pcol]
            ), leaf


# ---------------------------------------------------------------------------
# q_delong


def _delong_numpy(labels, sa, sb):
    """Brute-force DeLong reference: per-example structural components
    via full pairwise psi (fine at sf0.001), sample covariances, z."""
    import numpy as np

    labels = np.asarray(labels)
    pos_a, neg_a = np.asarray(sa)[labels == 1], np.asarray(sa)[labels == 0]
    pos_b, neg_b = np.asarray(sb)[labels == 1], np.asarray(sb)[labels == 0]
    m, n = len(pos_a), len(neg_a)

    # V10_i = mean_j psi(x_i, y_j); V01_j = mean_i psi(x_i, y_j)
    def comps2(pos, neg):
        psi = (pos[:, None] > neg[None, :]) + 0.5 * (pos[:, None] == neg[None, :])
        return psi.mean(axis=1), psi.mean(axis=0)

    v10a, v01a = comps2(pos_a, neg_a)
    v10b, v01b = comps2(pos_b, neg_b)
    auc_a, auc_b = v10a.mean(), v10b.mean()
    s10 = np.cov(np.vstack([v10a, v10b]), ddof=1)
    s01 = np.cov(np.vstack([v01a, v01b]), ddof=1)
    var = (s10[0, 0] + s10[1, 1] - 2 * s10[0, 1]) / m + (
        s01[0, 0] + s01[1, 1] - 2 * s01[0, 1]
    ) / n
    return auc_a, auc_b, (auc_a - auc_b) / var**0.5


def test_delong_matches_numpy_reference(spark, sf_dir, duck):
    from fraud_detection_spark.operators.ml_metrics import _SCORED2_SQL

    got = REGISTRY["q_delong"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = duck.execute(f"WITH r AS ({_SCORED2_SQL}) SELECT * FROM r").df()
    auc_a, auc_b, z = _delong_numpy(rows.label, rows.sa, rows.sb)
    assert abs(got.auc_a - auc_a) < 1e-6
    assert abs(got.auc_b - auc_b) < 1e-6
    assert abs(got.z - z) < 1e-4  # numpy path is float, query is exact-int
    assert got.n_pos == int(rows.label.sum())
    assert got.n_neg == int((1 - rows.label).sum())


def test_delong_auc_a_equals_q_auc(spark, sf_dir):
    """The published-model side of the paired comparison IS q_auc's
    tie-aware Mann-Whitney AUC — same scorer, same rounded-score tie
    structure, so the two declared queries must agree to the digit."""
    a1 = REGISTRY["q_auc"].fn(spark, sf_dir).toPandas().auc.iloc[0]
    a2 = REGISTRY["q_delong"].fn(spark, sf_dir).toPandas().auc_a.iloc[0]
    assert a1 == a2


# ---------------------------------------------------------------------------
# q_ivfpq_probe_curve


def test_probe_curve_matches_numpy_reference(spark, sf_dir, duck):
    """Brute-force reference: numpy cosines for the 10-query panel,
    exact (round6 desc, vec_id) top-10, cells from the same sign
    planes, recall/scan recomputed from scratch."""
    import numpy as np

    from fraud_detection_spark.operators.similarity import _ann_plane_signs

    got = (
        REGISTRY["q_ivfpq_probe_curve"].fn(spark, sf_dir).toPandas()
        .set_index("h").sort_index()
    )
    rows = duck.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
        "ORDER BY vec_id"
    ).df()
    E = np.stack(rows.e.to_numpy())
    ids = rows.vec_id.to_numpy()
    planes = np.array([_ann_plane_signs(j) for j in range(4)])
    # sequential fold == dot for the sign DECISION in every observed
    # case; recompute cells with plain dot (test-only reference)
    cells = ((E @ planes.T > 0) * np.array([1, 2, 4, 8])).sum(axis=1)
    norm = np.linalg.norm(E, axis=1)
    retained = np.zeros(5)
    for qid in range(10):
        qi = np.where(ids == qid)[0][0]
        cos = np.round((E @ E[qi]) / (norm * norm[qi]), 6)
        order = sorted(
            [(id_, c) for id_, c in zip(ids, cos) if id_ != qid],
            key=lambda t: (-t[1], t[0]),
        )[:10]
        top_ids = {t[0] for t in order}
        ham = np.vectorize(lambda c: bin(int(c) ^ int(cells[qi])).count("1"))(
            cells
        )
        for h in range(5):
            within = {i for i, hm in zip(ids, ham) if hm <= h}
            retained[h] += len(top_ids & within)
    for h in range(5):
        assert abs(got.loc[h, "recall_at_10"] - retained[h] / 100.0) < 2e-6, h
    # scan fraction from the same cells
    n = len(ids)
    for h in range(5):
        s = sum(
            (bin(int(c) ^ int(cells[np.where(ids == q)[0][0]])).count("1") <= h)
            for q in range(10)
            for c in cells
        )
        assert abs(got.loc[h, "scan_frac"] - (s - 10) / (10.0 * (n - 1))) < 2e-6


def test_probe_curve_shape_invariants(spark, sf_dir):
    got = (
        REGISTRY["q_ivfpq_probe_curve"].fn(spark, sf_dir).toPandas()
        .set_index("h").sort_index()
    )
    assert list(got.index) == [0, 1, 2, 3, 4]
    assert list(got.cells_probed) == [1, 5, 11, 15, 16]
    # both axes monotone nondecreasing; full radius is exhaustive
    assert (got.recall_at_10.diff().dropna() >= -1e-12).all()
    assert (got.scan_frac.diff().dropna() >= -1e-12).all()
    assert got.loc[4, "recall_at_10"] == 1.0
    assert got.loc[4, "scan_frac"] == 1.0


# ---------------------------------------------------------------------------
# q_dedup_funnel


def test_funnel_matches_python_recomputation(spark, sf_dir):
    """Recompute the single-pass keep-earliest funnel in python from
    the member queries' own outputs (each independently oracle-green):
    the funnel must equal stagewise set algebra over those pair sets."""
    got = (
        REGISTRY["q_dedup_funnel"].fn(spark, sf_dir).toPandas()
        .set_index("source").sort_index()
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    ).toPandas()
    ex = REGISTRY["q_dedup_exact"].fn(spark, sf_dir).toPandas()
    import hashlib

    texts = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    texts["h"] = texts.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    keep = texts.groupby("h").doc_id.min()
    a1 = set(texts[texts.doc_id.isin(set(keep))].doc_id)

    sig = REGISTRY["q_dedup_simhash"].fn(spark, sf_dir).toPandas()
    p2 = []
    for _, grp in sig.groupby("band"):
        rows = grp.sort_values("doc_id").to_dict("records")
        for i in range(len(rows)):
            for k in range(i + 1, len(rows)):
                if bin(int(rows[i]["simhash"]) ^ int(rows[k]["simhash"])).count(
                    "1"
                ) <= 3:
                    p2.append((rows[i]["doc_id"], rows[k]["doc_id"]))
    p3 = [
        tuple(r)
        for r in REGISTRY["q_dedup_jaccard"].fn(spark, sf_dir)
        .select("doc_a", "doc_b").toPandas().to_numpy()
    ]
    p4 = [
        tuple(r)
        for r in REGISTRY["q_dedup_embedding"].fn(spark, sf_dir)
        .select("vec_a", "vec_b").toPandas().to_numpy()
    ]

    def survive(alive, pairs):
        dropped = {b for a, b in pairs if a in alive and b in alive}
        return alive - dropped

    a2 = survive(a1, p2)
    a3 = survive(a2, p3)
    a4 = survive(a3, p4)
    ref = d.assign(
        f1=d.doc_id.isin(a1),
        f2=d.doc_id.isin(a2),
        f3=d.doc_id.isin(a3),
        f4=d.doc_id.isin(a4),
    ).groupby("source").agg(
        n_docs=("doc_id", "size"),
        n_after_exact=("f1", "sum"),
        n_after_simhash=("f2", "sum"),
        n_after_jaccard=("f3", "sum"),
        n_after_embedding=("f4", "sum"),
    ).sort_index()
    for col in ref.columns:
        assert (got[col] == ref[col]).all(), col


def test_funnel_monotone_and_totals(spark, sf_dir):
    got = REGISTRY["q_dedup_funnel"].fn(spark, sf_dir).toPandas()
    assert (got.n_after_exact <= got.n_docs).all()
    assert (got.n_after_simhash <= got.n_after_exact).all()
    assert (got.n_after_jaccard <= got.n_after_simhash).all()
    assert (got.n_after_embedding <= got.n_after_jaccard).all()
    # exact stage total equals the number of md5 groups corpus-wide
    ex = REGISTRY["q_dedup_exact"].fn(spark, sf_dir).toPandas()
    assert got.n_after_exact.sum() == len(ex)


# ---------------------------------------------------------------------------
# q_page_hinkley + streaming twin


def test_page_hinkley_stream_matches_batch_exactly(spark, sf_dir, tmp_path):
    """Bit-exact stream==batch parity: the stateful stream fed the
    same events in 3 time-ordered slices (state carries PH
    accumulators + the open day across checkpointed restarts) must
    emit exactly q_page_hinkley's rows for every day except the final
    (still-open) one."""
    import shutil

    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.streaming.drift import page_hinkley_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "value")
        .orderBy("ts")
    )
    pdf = ev.toPandas()
    n = len(pdf)
    n_slices = 3
    rows_per = (n + n_slices - 1) // n_slices
    src = tmp_path / "ph_src"
    src.mkdir()
    for i in range(n_slices):
        chunk = pdf.iloc[i * rows_per : (i + 1) * rows_per]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"slice_{i:03d}"))
    paths = sorted(str(p) for p in src.glob("slice_*"))
    schema = ev.schema
    ckpt = str(tmp_path / "ph_ckpt")
    out = str(tmp_path / "ph_out")
    staged = tmp_path / "ph_staged"
    staged.mkdir()
    for i, p in enumerate(paths):
        shutil.copytree(p, str(staged / f"s{i}"))
        stream_in = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(staged))
        q = (
            page_hinkley_stream(stream_in)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out).toPandas().sort_values("day").reset_index(
        drop=True
    )
    batch = REGISTRY["q_page_hinkley"].fn(spark, sf_dir).toPandas()
    want = (
        batch[batch.day < batch.day.max()]
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got.series == "amount").all()
    for c in ["day", "day_mean", "ph_inc", "ph_dec", "alarm"]:
        assert (got[c].values == want[c].values).all(), c


def test_page_hinkley_statistic_invariants(spark, sf_dir):
    got = REGISTRY["q_page_hinkley"].fn(spark, sf_dir).toPandas()
    assert (got.ph_inc >= 0).all() and (got.ph_dec >= 0).all()
    # first day: running mean == x, so both sides read exactly -delta
    # floored at the min => PH = 0
    first = got.sort_values("day").iloc[0]
    assert first.ph_inc == 0.0 and first.ph_dec == 0.0
    # python reference recomputation (same association order)
    import math

    xs = got.sort_values("day").day_mean.tolist()
    from fraud_detection_spark.operators.timeseries import PH_DELTA, PH_LAMBDA

    i, sx, mi, md = 0, 0.0, 0.0, 0.0
    mmin, mdmin = float("inf"), float("inf")
    for k, x in enumerate(xs):
        i += 1
        sx += x
        mi += x - sx / i - PH_DELTA
        md += sx / i - x - PH_DELTA
        mmin = min(mmin, mi)
        mdmin = min(mdmin, md)
        row = got.sort_values("day").iloc[k]
        assert abs(row.ph_inc - (mi - mmin)) < 2e-6
        assert abs(row.ph_dec - (md - mdmin)) < 2e-6
        assert row.alarm == int(
            (mi - mmin) > PH_LAMBDA or (md - mdmin) > PH_LAMBDA
        )


# ---------------------------------------------------------------------------
# q_tree5


def test_tree5_matches_python_reference(spark, sf_dir, duck):
    """Exhaustive greedy reference to depth 5: recursive best-split
    over the cumulative table with branch-interval candidate sets —
    every emitted (level, branch) pick compared on threshold and exact
    counts; unreachable branches must be absent."""
    got = (
        REGISTRY["q_tree5"].fn(spark, sf_dir).toPandas()
        .set_index(["level", "branch"])
    )
    rows = _cum_rows(duck)
    n, p = rows[-1][1], rows[-1][2]
    seen = set()

    def rec(level, branch, lo, hi, n0, p0, nb, pb):
        if level >= 5:
            return
        sub = [r for r in rows if lo < r[0] < hi]
        best = _best_split(sub, n0, p0, nb, pb)
        key = (level, branch)
        if best is None:
            assert key not in got.index, key
            return
        seen.add(key)
        _, thr, nl, pl, nr, pr = best
        assert abs(got.loc[key, "threshold"] - thr) < 1e-12, key
        assert got.loc[key, "n_left"] == nl, key
        assert got.loc[key, "pos_left"] == pl, key
        assert got.loc[key, "n_right"] == nr, key
        assert got.loc[key, "pos_right"] == pr, key
        # children: left keeps the base, right advances it to the
        # threshold's absolute cumulative position
        rec(level + 1, branch * 2, lo, thr, n0, p0, nl, pl)
        rec(level + 1, branch * 2 + 1, thr, hi, n0 + nl, p0 + pl, nr, pr)

    rec(0, 0, -1.0, 2.0, 0, 0, n, p)
    assert seen == set(got.index)


def test_tree5_prefix_is_tree3(spark, sf_dir):
    """Levels 0-2 of q_tree5 ARE q_tree3's seven nodes (same argmins,
    different orchestration — per-level argmin agg vs per-node
    TakeOrdered); every gain >= 0."""
    t5 = (
        REGISTRY["q_tree5"].fn(spark, sf_dir).toPandas()
        .set_index(["level", "branch"])
    )
    t3 = REGISTRY["q_tree3"].fn(spark, sf_dir).toPandas().set_index("node")
    mapping = {
        "root": (0, 0),
        "left": (1, 0),
        "right": (1, 1),
        "ll": (2, 0),
        "lr": (2, 1),
        "rl": (2, 2),
        "rr": (2, 3),
    }
    for node, key in mapping.items():
        if node in t3.index:
            assert key in t5.index, node
            for col in t3.columns:
                assert t5.loc[key, col] == t3.loc[node, col], (node, col)
        else:
            assert key not in t5.index, node
    assert (t5["gain"] >= -1e-12).all()


# ---------------------------------------------------------------------------
# q_tree5_confusion


def test_tree5_confusion_matches_ladder_reconstruction(spark, sf_dir, duck):
    """Rebuild the leaf partition in python purely from q_tree5's
    emitted picks (a child absent from the pick table is a leaf whose
    (n, pos) are the parent's side counts) and recompute every
    confusion cell from the leaf majority votes — no scoring pass
    needed, so agreement proves the interval routing matched the
    training counts exactly."""
    t5 = (
        REGISTRY["q_tree5"].fn(spark, sf_dir).toPandas()
        .set_index(["level", "branch"])
    )
    got = (
        REGISTRY["q_tree5_confusion"].fn(spark, sf_dir).toPandas()
        .set_index(["prediction", "label"])["n"]
        .to_dict()
    )
    from fraud_detection_spark.operators.ml_metrics import SCORED_SQL

    n_all, p_all = duck.execute(
        f"WITH s AS ({SCORED_SQL}) SELECT COUNT(*), SUM(label) FROM s"
    ).fetchone()
    cells = {(0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0}

    def leaf(nb, pb):
        pred = int(2 * pb > nb)
        cells[(pred, 1)] += pb
        cells[(pred, 0)] += nb - pb

    def walk(level, branch, nb, pb):
        if level >= 5 or (level, branch) not in t5.index:
            leaf(nb, pb)
            return
        row = t5.loc[(level, branch)]
        walk(level + 1, branch * 2, int(row.n_left), int(row.pos_left))
        walk(level + 1, branch * 2 + 1, int(row.n_right), int(row.pos_right))

    walk(0, 0, int(n_all), int(p_all))
    for key, want in cells.items():
        assert got.get(key, 0) == want, key
    assert sum(got.values()) == int(n_all)


# ---------------------------------------------------------------------------
# q_logrank


def test_logrank_matches_python_reference(spark, sf_dir, duck):
    """Textbook Mantel-Cox recomputation from the per-user
    (arm, duration, event) rows: risk sets by descending duration,
    hypergeometric E/V per event time, z from the exact sums."""
    import math

    rows = duck.execute(
        "WITH u AS (SELECT user_id % 2 AS arm, "
        "MIN(epoch_ns(ts) // 1000000000) AS f, "
        "MAX(epoch_ns(ts) // 1000000000) AS l, "
        "MIN(CASE WHEN event_type = 'error' THEN epoch_ns(ts) // 1000000000 "
        "END) AS e FROM events GROUP BY user_id) "
        "SELECT arm, CASE WHEN e IS NOT NULL THEN (e - f) // 86400 "
        "ELSE (l - f) // 86400 END AS dur, "
        "CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u"
    ).fetchall()
    got = REGISTRY["q_logrank"].fn(spark, sf_dir).toPandas().iloc[0]
    o1 = e1 = v = 0.0
    durs = sorted({d for _, d, _ in rows})
    for t in durs:
        at_risk = [(a, d, e) for a, d, e in rows if d >= t]
        n = len(at_risk)
        n1 = sum(1 for a, _, _ in at_risk if a == 1)
        de = sum(e for _, d, e in rows if d == t)
        d1 = sum(e for a, d, e in rows if d == t and a == 1)
        if de == 0:
            continue
        o1 += d1
        e1 += de * n1 / n
        if n > 1:
            v += de * (n1 / n) * (1 - n1 / n) * (n - de) / (n - 1)
    assert got.o_treat == o1
    assert abs(got.e_treat - e1) < 1e-5
    assert abs(got.var_treat - v) < 1e-5
    assert abs(got.z - (o1 - e1) / math.sqrt(v)) < 1e-4
    assert got.n_control + got.n_treat == len(rows)
    assert got.events_control + got.events_treat == sum(e for *_, e in rows)


def test_page_hinkley_stream_multi_series(spark, sf_dir, tmp_path):
    """One INDEPENDENT PH monitor per event_type: every series'
    emitted rows must equal the python reference run on that series'
    own day-mean sequence (same fixed-point day means, same
    association order), with per-series day closure — the keyed-state
    claim of page_hinkley_stream, not just the single-key twin."""
    import math
    import shutil

    from fraud_detection_spark.operators.timeseries import PH_DELTA, PH_LAMBDA
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.streaming.drift import page_hinkley_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "value", "event_type")
        .orderBy("ts")
    )
    pdf = ev.toPandas()
    n_slices = 3
    rows_per = (len(pdf) + n_slices - 1) // n_slices
    src = tmp_path / "phm_src"
    src.mkdir()
    for i in range(n_slices):
        chunk = pdf.iloc[i * rows_per : (i + 1) * rows_per]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"slice_{i:03d}"))
    schema = ev.schema
    ckpt = str(tmp_path / "phm_ckpt")
    out = str(tmp_path / "phm_out")
    staged = tmp_path / "phm_staged"
    staged.mkdir()
    for i, p in enumerate(sorted(str(x) for x in src.glob("slice_*"))):
        shutil.copytree(p, str(staged / f"s{i}"))
        stream_in = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(staged))
        q = (
            page_hinkley_stream(stream_in, series_expr="event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out).toPandas()
    assert got.series.nunique() >= 3  # real fan-out

    # python reference per series over the exact fixed-point day means
    pdf["day"] = pdf.ts // 1_000_000_000 // 86400
    pdf["units"] = (pdf.value * 10000 + 0.5).apply(math.floor).astype(int)
    for series, g in pdf.groupby("event_type"):
        days = g.groupby("day").agg(u=("units", "sum"), c=("units", "size"))
        days = days.sort_index()
        want_days = list(days.index[:-1])  # final day stays open
        sub = got[got.series == series].sort_values("day")
        assert list(sub.day) == want_days, series
        i, sx, mi, md = 0, 0.0, 0.0, 0.0
        mmin, mdmin = float("inf"), float("inf")
        for day, row in days.iloc[:-1].iterrows():
            y = float(row.u) / 10000 / row.c
            x = math.floor(y * 10000 + 0.5) / 10000
            i += 1
            sx += x
            mi += x - sx / i - PH_DELTA
            md += sx / i - x - PH_DELTA
            mmin = min(mmin, mi)
            mdmin = min(mdmin, md)
            r = sub[sub.day == day].iloc[0]
            assert r.day_mean == math.floor(x * 10000 + 0.5) / 10000, (series, day)
            assert r.ph_inc == math.floor((mi - mmin) * 1e6 + 0.5) / 1e6, (series, day)
            assert r.ph_dec == math.floor((md - mdmin) * 1e6 + 0.5) / 1e6, (series, day)
            assert r.alarm == int(
                (mi - mmin) > PH_LAMBDA or (md - mdmin) > PH_LAMBDA
            ), (series, day)
