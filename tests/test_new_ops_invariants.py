"""Invariant checks for the round-2 additions — properties the oracle
hash-compare can't express (identities, bounds, and cross-row
conservation laws that must hold for ANY corpus, not just the fixture)."""

from __future__ import annotations

import math

from flu_data_pipeline_spark.plans import REGISTRY

from .conftest import SF_ORACLE


def _rows(spark, name):
    return REGISTRY[name].builder(spark, SF_ORACLE).collect()


def test_temperature_mix_quota_conserves_budget(spark):
    rows = _rows(spark, "corpus_temperature_mix")
    assert sum(r["quota"] for r in rows) == 100000
    # temperature T=2 flattens: every weight sits between uniform and raw
    # share on the CORRECT side (sqrt pulls toward uniform)
    for r in rows:
        if r["p"] < 1.0 / len(rows):
            assert r["w"] >= r["p"]
        else:
            assert r["w"] <= r["p"] + 1e-9


def test_vocab_cutoff_cumulative_monotone(spark):
    rows = _rows(spark, "vocab_coverage_cutoff")
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] <= 1.0 + 1e-9
    # the in-vocab prefix is contiguous: once out, never back in
    flags = [r["in_vocab_90"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    # counts non-increasing in rank order
    counts = [r["term_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_epoch_shuffle_conserves_docs_and_reorders(spark):
    rows = _rows(spark, "epoch_shuffle_plan")
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    n_docs_total = {e: sum(r["n_docs"] for r in v) for e, v in by_epoch.items()}
    # every epoch partitions the same corpus
    assert len(set(n_docs_total.values())) == 1
    # different epochs produce genuinely different permutations
    checksums = {
        e: tuple(sorted(r["order_checksum"] for r in v))
        for e, v in by_epoch.items()
    }
    assert len(set(checksums.values())) == len(checksums)


def test_length_buckets_cover_and_waste_bounded(spark):
    rows = _rows(spark, "length_bucket_batching")
    for r in rows:
        assert 0.0 <= r["waste_ratio"] < 1.0
        assert r["padded_tokens"] == (
            r["n_batches"] * 8 * r["bucket_len"] - r["total_tokens"]
        )
        # a doc never overflows its bucket
        assert r["total_tokens"] <= r["n_docs"] * r["bucket_len"]


def test_rbo_bounded_and_consistent(spark):
    (row,) = _rows(spark, "ranking_rbo_eval")
    assert 0.0 <= row["rbo"] <= 1.0 + 1e-9
    assert 0 <= row["overlap_at_k"] <= row["depth"]
    # perfect-agreement RBO at depth 10, p=0.9 is (1-p)*sum(p^(d-1)) < 1;
    # the observed value can never exceed that truncated maximum
    max_rbo = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 11))
    assert row["rbo"] <= max_rbo + 1e-9


def test_fs_weights_signs_and_probs(spark):
    rows = _rows(spark, "linkage_fs_weights")
    assert {r["field"] for r in rows} == {"brand", "type", "size"}
    for r in rows:
        assert 0.0 < r["m_prob"] < 1.0
        assert 0.0 < r["u_prob"] < 1.0
        # weight identities: w_agree = ln(m/u), w_disagree = ln((1-m)/(1-u)).
        # m/u are 6dp-rounded in the output while weights were computed
        # pre-rounding, so ln error is bounded by 5e-7/p per operand.
        m, u = r["m_prob"], r["u_prob"]
        tol_a = 1e-6 + 5e-7 / m + 5e-7 / u
        tol_d = 1e-6 + 5e-7 / (1 - m) + 5e-7 / (1 - u)
        assert math.isclose(r["w_agree"], math.log(m / u), abs_tol=tol_a)
        assert math.isclose(
            r["w_disagree"], math.log((1 - m) / (1 - u)), abs_tol=tol_d
        )
        # sign consistency is exact: agreement evidence positive iff m > u
        assert (r["w_agree"] > 0) == (m > u)


def test_seasonal_decompose_identity(spark):
    rows = _rows(spark, "ts_seasonal_decompose")
    assert rows
    for r in rows:
        if None in (r["trend"], r["seasonal"], r["resid"]):
            continue
        assert math.isclose(
            r["daily_value"],
            r["trend"] + r["seasonal"] + r["resid"],
            abs_tol=5e-6,
        )
        assert 0 <= r["dow"] <= 6


def test_dp_release_noise_is_laplace_shaped(spark):
    rows = _rows(spark, "dp_noisy_release")
    for r in rows:
        assert math.isclose(
            r["noisy_count"] - r["true_count"], r["noise"], abs_tol=2e-6
        )
        assert r["epsilon"] == 1.0
    # scale b = 1/eps = 1: |noise| rarely exceeds ~6b; the seeded draws
    # must not collapse to a constant either
    noises = [r["noise"] for r in rows]
    assert max(abs(n) for n in noises) < 12.0
    assert len({round(n, 6) for n in noises}) > 1


def test_cas_chunks_savings_accounting(spark):
    rows = _rows(spark, "multimodal_cas_chunks")
    for r in rows:
        assert r["n_copies"] > 1
        assert r["n_docs"] <= r["n_copies"]
        assert r["bytes_saved"] == (r["n_copies"] - 1) * r["chunk_len"]
        assert 1 <= r["chunk_len"] <= 64


def test_sssp_dists_dominated_by_bfs_reach(spark):
    rows = _rows(spark, "sssp_weighted_cosupply")
    # source itself at distance 0, everything else positive
    dists = sorted(r["dist"] for r in rows)
    assert dists[0] == 0
    assert all(d > 0 for d in dists[1:])


def test_compaction_plan_arithmetic(spark):
    rows = _rows(spark, "compaction_plan_by_month")
    for r in rows:
        assert r["est_bytes"] == r["n_rows"] * 120
        assert r["target_files"] >= 1
        assert r["rows_per_file"] * r["target_files"] >= r["n_rows"]
        assert r["files_saved"] == r["current_files"] - r["target_files"]


def test_affinity_lift_identities(spark):
    rows = _rows(spark, "brand_affinity_lift")
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["support_ab"] >= 5
        assert r["support_ab"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["confidence_a_b"] <= 1.0


def test_rfm_cells_partition_customers(spark):
    rows = _rows(spark, "customer_rfm_segments")
    # quintile scores in range; cells partition the customer base
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["n_customers"] >= 1
        # segment label is a pure function of (r, f)
        if r["r_score"] <= 2 and r["f_score"] <= 2:
            assert r["segment"] == "champion"
        elif r["r_score"] <= 2:
            assert r["segment"] == "recent"
        elif r["f_score"] <= 2:
            assert r["segment"] == "loyal-lapsing"
        else:
            assert r["segment"] == "hibernating"


def test_poisson_bootstrap_replicates_plausible(spark):
    rows = _rows(spark, "poisson_bootstrap_se")
    assert len(rows) == 5
    ses = {r["boot_se"] for r in rows}
    assert len(ses) == 1  # one SE, replicated per row
    means = [r["boot_mean"] for r in rows]
    # Poisson(1) effective sample sizes concentrate near n (within ~5 sigma)
    n_effs = [r["n_eff"] for r in rows]
    avg_n = sum(n_effs) / len(n_effs)
    for n in n_effs:
        assert abs(n - avg_n) < 5 * (avg_n ** 0.5) + 1
    # the SE equals the sample stddev of the replicate means
    mbar = sum(means) / len(means)
    sd = (sum((m - mbar) ** 2 for m in means) / (len(means) - 1)) ** 0.5
    assert math.isclose(ses.pop(), sd, rel_tol=1e-4)


def test_skyline_is_exactly_the_pareto_front(spark):
    import duckdb

    sky = {
        (r["p_partkey"], r["p_size"], r["price_cents"])
        for r in _rows(spark, "skyline_price_size")
    }
    pts = duckdb.connect().execute(
        "SELECT p_partkey, p_size, CAST(FLOOR(p_retailprice * 100) AS BIGINT)"
        f" FROM '{SF_ORACLE}/part.parquet'"
    ).fetchall()

    def dominated(p, by):
        return (
            by[2] <= p[2]
            and by[1] >= p[1]
            and (by[2] < p[2] or by[1] > p[1])
        )

    # brute-force ground truth over all points (sf0.01 is small enough)
    truth = {
        p for p in pts if not any(dominated(p, q) for q in pts if q[0] != p[0])
    }
    assert {(k, s, c) for k, s, c in truth} == sky


def test_cusum_changepoint_is_argmax(spark):
    rows = _rows(spark, "ts_cusum_changepoint")
    assert {r["event_type"] for r in rows} == {
        "click", "error", "purchase", "signup", "view",
    }
    for r in rows:
        assert r["n_days"] >= 1
        # scaled cusum at the final day is zero by construction, so the
        # argmax is a genuine interior deviation unless the series is flat
        assert r["cusum_scaled"] != 0 or r["n_days"] == 1


def test_wilson_ci_brackets_rate(spark):
    rows = _rows(spark, "funnel_wilson_ci")
    assert [r["step"] for r in rows] == ["click->purchase", "view->click"]
    for r in rows:
        assert 0.0 <= r["ci_low"] <= r["rate"] <= r["ci_high"] <= 1.0
        assert r["n_conv"] <= r["n_prev"]


def test_u_shaped_attribution_conserves_credit(spark):
    rows = _rows(spark, "attribution_u_shaped")
    total_credit = sum(r["total_credit"] for r in rows)
    # every attributed purchase hands out exactly 1.0 of credit, so the
    # grand total equals the number of purchases with >= 1 click in 24h
    import duckdb

    n_attributed = duckdb.connect().execute(
        f"""
        WITH p AS (SELECT event_id, user_id,
                          CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
                   FROM '{SF_ORACLE}/events.parquet'
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
                   FROM '{SF_ORACLE}/events.parquet'
                   WHERE event_type = 'click')
        SELECT COUNT(*) FROM p
        WHERE EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
                      AND c.t <= p.t AND c.t >= p.t - 86400)
        """
    ).fetchone()[0]
    assert abs(total_credit - n_attributed) < 1e-3


def test_markov_absorption_probabilities_valid(spark):
    rows = {r["state"]: r["p_purchase_within_4"]
            for r in _rows(spark, "markov_absorption_conversion")}
    assert rows["purchase"] == 1.0
    assert rows["error"] == 0.0
    for state, p in rows.items():
        assert 0.0 <= p <= 1.0
    # transient states have strictly interior probabilities on this
    # fixture (every state can reach both absorbers)
    for state in set(rows) - {"purchase", "error"}:
        assert 0.0 < rows[state] < 1.0


def test_hilbert_index_is_a_true_hilbert_curve(spark):
    """The unrolled SQL xy->d transform must BE the Hilbert curve, not
    merely engine-consistent: check it equals the classic reference
    algorithm on the full 256x256 grid, is a bijection, and consecutive
    curve positions are always grid-adjacent (the defining property that
    Z-order lacks)."""
    from pyspark.sql import functions as F

    from flu_data_pipeline_spark.plans.layout_queries import (
        _hilbert_step_exprs,
    )

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).cast("int").alias("gx"),
            (F.col("id") / 256).cast("int").alias("gy"),
        )
        .select(
            "gx",
            "gy",
            F.col("gx").alias("x0"),
            F.col("gy").alias("y0"),
            F.lit(0).alias("d0"),
        )
    )
    for i, b in enumerate(range(7, -1, -1)):
        x_new, y_new, d_new = _hilbert_step_exprs(i, b, spark_side=True)
        grid = grid.select(
            "gx",
            "gy",
            F.expr(x_new).alias(f"x{i + 1}"),
            F.expr(y_new).alias(f"y{i + 1}"),
            F.expr(d_new).alias(f"d{i + 1}"),
        )
    rows = grid.select("gx", "gy", F.col("d8").alias("h")).collect()

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
            s //= 2
        return d

    pos = {}
    for r in rows:
        assert r["h"] == xy2d(256, r["gx"], r["gy"])
        pos[r["h"]] = (r["gx"], r["gy"])
    assert len(pos) == 256 * 256  # bijection onto 0..65535
    for d in range(256 * 256 - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # always grid-adjacent


def test_removal_plan_spans_valid(spark):
    """Byte-range removal plan: spans non-overlapping per doc, strictly
    inside doc bounds, bytes_removed consistent — for the real corpus."""
    import duckdb

    rows = _rows(spark, "text_dedup_removal_plan")
    assert rows, "fixture corpus must contain duplicated chunks"
    lens = dict(
        duckdb.sql(
            f"SELECT doc_id, length(text) FROM "
            f"'{SF_ORACLE}/documents.parquet'"
        ).fetchall()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["span_start"])
        prev_end = -1
        for s in spans:
            assert 0 <= s["span_start"] < s["span_end"] <= lens[doc_id]
            assert s["bytes_removed"] == s["span_end"] - s["span_start"]
            # non-overlapping AND non-adjacent (adjacent chunks merge)
            assert s["span_start"] > prev_end
            prev_end = s["span_end"]


def test_removal_plan_merges_adjacent_chunks(spark):
    """Handcrafted corpus: doc 2 repeats doc 1's 20 tokens verbatim, so
    BOTH of doc 2's chunks are duplicates of doc 1's (the global first
    occurrences) and must merge into ONE span covering all of doc 2;
    doc 1 keeps everything. The span's byte arithmetic is checked
    against the plain-Python ground truth."""
    from flu_data_pipeline_spark.plans.text_queries import (
        _removal_plan_frame,
    )

    t1 = " ".join(f"w{i:02d}" for i in range(20))  # 2 full chunks
    docs = spark.createDataFrame(
        [(1, t1), (2, t1), (3, "unique tokens only here")],
        "doc_id long, text string",
    )
    got = _removal_plan_frame(docs).collect()
    assert len(got) == 1
    (span,) = got
    assert span["doc_id"] == 2
    assert span["span_start"] == 0
    assert span["span_end"] == len(t1)
    assert span["bytes_removed"] == len(t1)


def test_sq8_reconstruction_error_bounded(spark):
    """SQ8's defining property: per-dimension reconstruction error is
    at most half a quantization step, (hi-lo)/255/2 — checked directly
    against the raw embeddings at the smoke scale."""
    import duckdb

    from flu_data_pipeline_spark.catalog import load_table
    from .conftest import SF_SMOKE

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    dims = len(next(iter(emb.values())))
    lo = [min(v[i] for v in emb.values()) for i in range(dims)]
    hi = [max(v[i] for v in emb.values()) for i in range(dims)]
    import math

    for v in list(emb.values())[:50]:
        for i in range(dims):
            if hi[i] == lo[i]:
                continue
            step = (hi[i] - lo[i]) / 255.0
            code = math.floor(255.0 * (v[i] - lo[i]) / (hi[i] - lo[i]) + 0.5)
            recon = lo[i] + code * step
            assert abs(recon - v[i]) <= step / 2 + 1e-9


def test_semdedup_witnesses_match_drop_count(spark):
    """Provenance completeness: semdedup_drop_witnesses must emit
    exactly one row per example dedup_semdedup_scale drops (same
    clustering, same chunk cap, same dominance predicate — only the
    aggregation differs), each witness must genuinely dominate its
    dropped example's cluster, and witness cosine >= the threshold."""
    wit = {r["vec_id"]: r for r in _rows(spark, "semdedup_drop_witnesses")}
    scale = _rows(spark, "dedup_semdedup_scale")
    dropped = {r["vec_id"] for r in scale if r["keep"] == 0}
    assert set(wit) == dropped
    cluster_of = {r["vec_id"]: r["cluster"] for r in scale}
    for v, r in wit.items():
        assert r["witness_cos"] >= 0.4 - 1e-9
        assert cluster_of[r["witness_id"]] == r["cluster"]


def test_removal_apply_conserves_bytes(spark):
    """Applying the removal plan must remove EXACTLY the planned bytes:
    cleaned_chars == orig_chars - sum(bytes_removed) per doc, and docs
    without spans pass through with identical length."""
    plan = _rows(spark, "text_dedup_removal_plan")
    removed = {}
    for r in plan:
        removed[r["doc_id"]] = removed.get(r["doc_id"], 0) + r["bytes_removed"]
    out = _rows(spark, "text_dedup_removal_apply")
    assert out
    for r in out:
        assert (
            r["cleaned_chars"]
            == r["orig_chars"] - removed.get(r["doc_id"], 0)
        )
        if r["n_spans"] == 0:
            assert r["cleaned_chars"] == r["orig_chars"]


# ---------------------------------------------------------------------------
# Round-8 additions: paragraph rewrite, WordPiece train/encode, Matryoshka
# — each checked against an INDEPENDENT pure-Python model (not the oracle
# SQL, which shares no code with these models)
# ---------------------------------------------------------------------------


def _corpus_words(sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lower(trim(text)) FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def test_paragraph_rewrite_matches_python(spark):
    import hashlib

    from .conftest import SF_ORACLE

    docs = _corpus_words(SF_ORACLE)
    seen = {}
    model = {}
    for doc_id, text in docs:  # doc_id ascending == global first-occurrence
        words = text.split(" ")
        chunks = [
            " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
        ]
        kept = []
        for pos, ch in enumerate(chunks):
            if ch not in seen:
                seen[ch] = (doc_id, pos)
                kept.append(ch)
        new_text = " ".join(kept)
        model[doc_id] = (
            len(chunks),
            len(kept),
            len(chunks) - len(kept),
            len(new_text),
            hashlib.md5(new_text.encode()).hexdigest()[:16],
        )
    out = _rows(spark, "dedup_paragraph_rewrite")
    assert len(out) == len(model)
    for r in out:
        assert (
            r["n_chunks"], r["n_kept"], r["n_removed"],
            r["new_n_chars"], r["new_text_md5"],
        ) == model[r["doc_id"]], r["doc_id"]


def _wp_python_train(word_counts, rounds):
    """Independent WordPiece trainer: likelihood argmax + left-to-right
    simultaneous merge, ties (score, x, y) pinned like the query."""
    state = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        pc, sc = {}, {}
        for w, syms in state.items():
            c = word_counts[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        (x, y), c = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (sc[kv[0][0]] * sc[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        merges.append((x, y, c, sc[x], sc[y]))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def _word_counts(sf_dir):
    counts = {}
    for _, text in _corpus_words(sf_dir):
        for w in text.split(" "):
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_wordpiece_train_matches_python(spark):
    from .conftest import SF_ORACLE

    counts = _word_counts(SF_ORACLE)
    merges = _wp_python_train(counts, 4)
    out = sorted(_rows(spark, "tokenizer_wordpiece_train"),
                 key=lambda r: r["merge_rank"])
    assert len(out) == 4
    for r, (x, y, c, cx, cy) in zip(out, merges):
        assert (r["sym_x"], r["sym_y"], r["pair_count"],
                r["cnt_x"], r["cnt_y"]) == (x, y, c, cx, cy)


def test_wordpiece_encode_matches_python(spark):
    from .conftest import SF_ORACLE

    counts = _word_counts(SF_ORACLE)
    merges = _wp_python_train(counts, 4)
    vocab = {x + y for x, y, *_ in merges}
    out = _rows(spark, "tokenizer_wordpiece_encode")
    assert len(out) == len(counts)
    for r in out:
        w = r["word"]
        pieces, pos = [], 0
        while pos < len(w):
            ln = 1
            for l in range(min(16, len(w) - pos), 1, -1):
                if w[pos : pos + l] in vocab:
                    ln = l
                    break
            pieces.append(w[pos : pos + ln])
            pos += ln
        assert r["cnt"] == counts[w]
        assert r["n_pieces"] == len(pieces), w
        assert r["pieces"] == " ".join(pieces), w


def test_matryoshka_recall_matches_python(spark):
    import duckdb

    from .conftest import SF_ORACLE

    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_ORACLE}/embeddings.parquet')"
        ).fetchall()
    )
    con.close()

    def topk(d):
        res = {}
        for qid in range(20):
            q = vecs[qid][:d]
            qn = sum(x * x for x in q) ** 0.5
            scored = []
            for nid, v in vecs.items():
                if nid == qid:
                    continue
                c = v[:d]
                num = sum(float(a) * float(b) for a, b in zip(q, c))
                cn = sum(float(x) * float(x) for x in c) ** 0.5
                scored.append((-(num / (qn * cn)), nid))
            scored.sort()
            res[qid] = {nid for _, nid in scored[:5]}
        return res

    full = topk(64)
    out = {r["dim_prefix"]: r for r in _rows(spark, "embedding_matryoshka_recall")}
    for d in (8, 16, 32):
        t = topk(d)
        hits = sum(len(t[q] & full[q]) for q in range(20))
        assert out[d]["hits"] == hits
        assert abs(out[d]["recall_at_k"] - round(hits / 100, 6)) < 1e-9


def test_paragraph_rewrite_edge_cases(spark):
    """Hand-built frame pinning the chunker's edge semantics: exact
    10-word multiples, short tails, single-word docs, and a duplicate
    appearing twice WITHIN one document (second occurrence must drop)."""
    import hashlib

    from flu_data_pipeline_spark.plans.dedup_queries import paragraph_rewrite

    w10 = " ".join(f"w{i}" for i in range(10))
    v10 = " ".join(f"v{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, w10),                      # exactly one full chunk
            (2, v10 + " " + v10),          # same NEW chunk twice IN ONE DOC
            (3, w10 + " tail words"),      # full chunk (dup of doc 1) + tail
            (4, "solo"),                   # single word
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_rewrite(docs).collect()}

    def md5p(s):
        return hashlib.md5(s.encode()).hexdigest()[:16]

    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (1, 1)
    assert out[1]["new_text_md5"] == md5p(w10)
    # doc 2: both chunks hash equal; the SECOND drops (same doc)
    assert (out[2]["n_chunks"], out[2]["n_kept"], out[2]["n_removed"]) == (
        2, 1, 1,
    )
    assert out[2]["new_text_md5"] == md5p(v10)
    # doc 3: its full chunk duplicates doc 1's (earlier doc wins);
    # only the tail survives
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (2, 1)
    assert out[3]["new_text_md5"] == md5p("tail words")
    assert out[3]["new_n_chars"] == len("tail words")
    # doc 4: one short chunk, unique, kept verbatim
    assert (out[4]["n_chunks"], out[4]["n_kept"]) == (1, 1)
    assert out[4]["new_text_md5"] == md5p("solo")


def test_isotonic_calibration_invariants(spark):
    """The PAVA fit's defining properties, which the minimax form must
    reproduce: monotone non-decreasing, weighted-mean preserving, and a
    fixed point on already-monotone inputs (per pooled block the fit
    equals the block mean — checked via block structure: equal adjacent
    iso values pool to their combined raw mean)."""
    rows = sorted(
        _rows(spark, "eval_isotonic_calibration"), key=lambda r: r["bin"]
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    # weighted mean preserved exactly up to float formation
    assert abs(
        sum(r["n"] * r["iso_rate"] for r in rows)
        - sum(r["n_pos"] for r in rows)
    ) < 1e-6
    # per-block means: group maximal runs of equal iso value
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and rows[j + 1]["iso_rate"] == rows[i]["iso_rate"]:
            j += 1
        block = rows[i : j + 1]
        pooled = sum(r["n_pos"] for r in block) / sum(r["n"] for r in block)
        assert abs(pooled - rows[i]["iso_rate"]) < 1e-9
        i = j + 1


def test_cross_source_matrix_conserves_duplicates(spark):
    """Every duplicated paragraph occurrence the rewrite removes must be
    attributed to exactly one (origin, duplicator) cell: the matrix total
    equals the rewrite audit's total n_removed."""
    removed = sum(r["n_removed"] for r in _rows(spark, "dedup_paragraph_rewrite"))
    matrix = _rows(spark, "dedup_paragraph_cross_source")
    assert sum(r["n_dup_paragraphs"] for r in matrix) == removed
    assert all(r["n_dup_paragraphs"] >= r["n_distinct_paragraphs"] > 0 for r in matrix)


# --------------------------------------------------------------------------
# round-9 additions: trained PQ codebooks, binary signatures, rerank rows
# --------------------------------------------------------------------------


def test_pq_trained_codebooks_match_python_lloyd(spark):
    """_pq_trained_codebooks == an independent pure-Python per-subspace
    Lloyd with the same contract (id-seeded init, (dist, cluster)
    argmin tie-break, 6dp mean rounding, empty-cluster carry-over) —
    the model test behind ann_serving_pq_rerank's training stage."""
    from flu_data_pipeline_spark.plans.similarity_queries import (
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _PQ_TRAIN_ITERS,
        _pq_trained_codebooks,
    )

    def synth(i: int) -> list[float]:
        # deterministic, varied-sign synthetic vectors (64 dims)
        return [
            round(math.sin(i * 1.7 + d * 0.31) * (1 + (d % 5)), 4)
            for d in range(64)
        ]

    n = 40
    rows = [(i, synth(i)) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["j"], r["cluster"]): [round(x, 6) for x in r["csub"]]
        for r in _pq_trained_codebooks(emb).collect()
    }

    # pure-python replay (float32 inputs: replicate the cast)
    import struct

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    subs = {
        (i, j): [f32(v) for v in synth(i)[j * _PQ_D : (j + 1) * _PQ_D]]
        for i in range(n)
        for j in range(_PQ_M)
    }
    cb = {
        (j, c): [round(x, 6) for x in subs[(c, j)]]
        for c in range(_PQ_K)
        for j in range(_PQ_M)
    }
    for _ in range(_PQ_TRAIN_ITERS):
        asg: dict[tuple[int, int], int] = {}
        for (i, j), s in subs.items():
            best = min(
                (
                    (
                        sum((a - b) * (a - b) for a, b in zip(s, cb[(j, c)])),
                        c,
                    )
                    for c in range(_PQ_K)
                ),
            )
            asg[(i, j)] = best[1]
        new = {}
        for j in range(_PQ_M):
            for c in range(_PQ_K):
                members = [
                    subs[(i, jj)]
                    for (i, jj), cc in asg.items()
                    if jj == j and cc == c
                ]
                if members:
                    new[(j, c)] = [
                        round(sum(m[d] for m in members) / len(members), 6)
                        for d in range(_PQ_D)
                    ]
                else:
                    new[(j, c)] = cb[(j, c)]
        cb = new
    want = {k: [round(x, 6) for x in v] for k, v in cb.items()}
    assert got.keys() == want.keys()
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert abs(a - b) < 1e-9, (k, got[k], want[k])


def test_binary_signature_packing_matches_python(spark):
    """_bq_word == independent Python bit math: bit i-1 of word k set
    iff component [k*32 + i] (1-based) is >= 0; both words positive."""
    from pyspark.sql import functions as F

    from flu_data_pipeline_spark.plans.similarity_queries import _bq_word

    def synth(i: int) -> list[float]:
        return [
            round(math.cos(i * 2.3 + d * 0.7), 4) or 0.0 for d in range(64)
        ]

    rows = [(i, synth(i)) for i in range(25)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["w0"], r["w1"])
        for r in emb.select(
            "vec_id",
            _bq_word(F.col("embedding"), 0).alias("w0"),
            _bq_word(F.col("embedding"), 1).alias("w1"),
        ).collect()
    }
    for i, vec in rows:
        w = [0, 0]
        for k in range(2):
            for b in range(32):
                if vec[k * 32 + b] >= 0.0:
                    w[k] |= 1 << b
        assert got[i] == (w[0], w[1]), i
        assert w[0] >= 0 and w[1] >= 0


def test_pq_rerank_recall_monotone_and_bounded(spark):
    """Recall@3 must be non-decreasing in shortlist size (a larger
    shortlist is a superset, and exact rerank of a superset can only
    keep or improve the top-3), n_hit <= n_truth_slots, and the
    largest-shortlist recall must reach at least the raw-ADC level."""
    rows = _rows(spark, "ann_serving_pq_rerank")
    rows = sorted(rows, key=lambda r: r["shortlist_size"])
    recalls = [r["recall_at_3"] for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert 0.0 <= r["recall_at_3"] <= 1.0
        assert r["n_hit"] <= r["n_truth_slots"]
        assert r["n_reranked"] <= r["shortlist_size"] * r["n_truth_slots"]


def test_binary_rerank_recall_monotone(spark):
    rows = _rows(spark, "ann_binary_hamming_rerank")
    rows = sorted(rows, key=lambda r: r["shortlist_size"])
    recalls = [r["recall_at_3"] for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert 0.0 <= r["recall_at_3"] <= 1.0


def test_group_split_leakproof_conservation(spark):
    """Both leakproof splits: doc counts conserve the corpus, the
    grouped/clustered leak is 0 by construction, and group counts
    per split sum to >= the global group count is impossible — they
    partition the group set exactly."""
    rows = _rows(spark, "sample_group_split_leakproof")
    assert {r["split"] for r in rows} <= {"train", "val"}
    assert all(r["leaky_groups_grouped"] == 0 for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    total_groups = sum(r["n_groups"] for r in rows)
    crows = _rows(spark, "sample_cluster_split_leakproof")
    assert all(r["leaky_pairs_clustered"] == 0 for r in crows)
    assert sum(r["n_docs"] for r in crows) == total_docs
    # cluster groups are coarser-or-equal: clustering can only merge
    # exact-duplicate groups, never split them
    assert sum(r["n_groups"] for r in crows) <= total_groups


def test_doremi_mixture_invariants(spark):
    """VERDICT r9 #6's contract: quotas sum exactly to the budget
    (largest-remainder, not rounding), the smoothed weights sum to 1,
    every domain keeps at least part of the uniform smoothing mass
    (no starvation — DoReMi's own safeguard), and the weight is
    MONOTONE in the domain's excess score (the multiplicative-weights
    step must never invert an ordering)."""
    rows = _rows(spark, "curation_doremi_mixture")
    assert sum(r["quota"] for r in rows) == 100000
    assert abs(sum(r["w"] for r in rows) - 1.0) < 1e-6
    n_dom = len(rows)
    for r in rows:
        # smoothing floor: w >= smooth/D even if the MW mass clamps to 0
        assert r["w"] >= 0.2 / n_dom - 1e-9
    by_excess = sorted(rows, key=lambda r: r["excess_micro"])
    ws = [r["w"] for r in by_excess]
    assert all(a <= b + 1e-9 for a, b in zip(ws, ws[1:]))
    # same monotonicity for the pre-smoothing MW weights
    wmw = [r["w_mw"] for r in by_excess]
    assert all(a <= b + 1e-9 for a, b in zip(wmw, wmw[1:]))
    # doc counts conserve the corpus (every source appears exactly once)
    assert len({r["source"] for r in rows}) == len(rows)


def test_doremi_apply_pass_conservation(spark):
    """Materialized mixture: per-row total_passes must equal the quota
    exactly (full_epochs*n_docs + n_extra is an identity of integer
    division), the extra-pass selection must pick exactly n_extra docs
    per domain (the distributed per-domain rank agrees with the
    arithmetic), and the budget is conserved across domains."""
    rows = _rows(spark, "curation_doremi_apply")
    assert sum(r["total_passes"] for r in rows) == 100000
    for r in rows:
        assert r["total_passes"] == r["quota"]
        assert r["n_extra_selected"] == r["n_extra"]
        assert 0 <= r["n_extra"] < r["n_docs"]
    # quotas must agree with the mixture query's own report
    mix = {r["source"]: r["quota"]
           for r in _rows(spark, "curation_doremi_mixture")}
    assert {r["source"]: r["quota"] for r in rows} == mix


def test_nndescent_recall_monotone_and_graph_bounds(spark):
    """NN-descent invariants (round 11): per-round recall@k is
    non-decreasing — each node's new list is the top-k of a SUPERSET
    of its old list under the total order (d9, neighbor id), and any
    candidate that displaces a truth member from a top-k list must
    itself rank above that member, hence be a truth member — so hits
    can only grow. Candidate volume stays under the rho-sampled bound
    N x (K+R)^2, and the final graph respects degree <= K with no
    self-loops."""
    from flu_data_pipeline_spark.plans.similarity_queries import (
        _NND_INIT,
        _NND_K,
        _NND_RREV,
    )

    rows = sorted(_rows(spark, "ann_nndescent_knn_graph"),
                  key=lambda r: r["iter"])
    assert [r["iter"] for r in rows] == [0, 1, 2]
    recalls = [r["recall_at_k"] for r in rows]
    assert recalls == sorted(recalls)
    hits = [r["n_hit"] for r in rows]
    assert hits == sorted(hits)
    n = rows[0]["n_nodes"]
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hit"] <= r["n_truth_slots"]
        assert r["k"] == _NND_K
    # init candidates bounded by N x INIT; round candidates by the
    # rho-sampling bound N x (K+R)^2
    assert rows[0]["n_candidates"] <= n * _NND_INIT
    for r in rows[1:]:
        assert r["n_candidates"] <= n * (_NND_K + _NND_RREV) ** 2
    # refinement must actually help on this corpus (init is random:
    # anything near-zero would stay near-zero if rounds were no-ops)
    assert recalls[-1] > recalls[0]


def test_nndescent_mutual_pairs_bounds(spark):
    """Reciprocal-kNN mining invariants: mutual pairs are at most
    |edges|/2 (each pair consumes two directed edges), edges at most
    N x K, counts internally consistent, agreement a valid ratio."""
    from flu_data_pipeline_spark.plans.similarity_queries import _NND_K

    (r,) = _rows(spark, "ann_nndescent_mutual_pairs")
    assert r["n_graph_edges"] <= r["n_nodes"] * _NND_K
    assert r["n_mutual_pairs"] <= r["n_graph_edges"] // 2
    assert 0 <= r["n_same_label"] <= r["n_mutual_pairs"]
    assert 0.0 <= r["label_agreement"] <= 1.0
    assert r["n_mutual_pairs"] > 0  # a kNN graph always has reciprocity


def test_nndescent_beam_search_monotone_and_bounded(spark):
    """Graph-serving walk invariants: the visited set only grows, so
    per-hop recall/hits are non-decreasing (top-3 of a superset under
    the same total order); visited is bounded by the N-INDEPENDENT
    walk budget |Q| x (1 + B*K*hop) — the whole point of graph
    serving at scale."""
    from flu_data_pipeline_spark.plans.similarity_queries import (
        _NND_BEAM_B,
        _NND_K,
        _SRV_NQ,
    )

    rows = sorted(_rows(spark, "ann_nndescent_beam_search"),
                  key=lambda r: r["hop"])
    assert [r["hop"] for r in rows] == [1, 2, 3]
    assert [r["n_hit"] for r in rows] == sorted(r["n_hit"] for r in rows)
    vis = [r["n_visited"] for r in rows]
    assert vis == sorted(vis)
    for r in rows:
        assert r["n_visited"] <= _SRV_NQ * (
            1 + _NND_BEAM_B * _NND_K * r["hop"]
        )
        assert 0.0 <= r["recall_at_3"] <= 1.0
