"""Token-payload operators (operators/tokens.py) and the as-of join
(operators/joins.py): property tests against pure-Python references,
edge cases, and scale-shape plan assertions."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_word_id(w: str, vocab: int = 50257) -> int:
    total = 0
    for i, ch in enumerate(w):
        total += ord(ch) * 31 ** (i % 8)
    return total % vocab


def _py_tokens(text: str | None) -> list[int]:
    if text is None or text.strip() == "":
        return []
    return [_py_word_id(w) for w in text.strip().lower().split()]


def test_tokenizer_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [
            (0, "Hello World", "s0"),
            (1, "  padded   whitespace\ttabs ", "s0"),
            (2, "", "s1"),
            (3, None, "s1"),
            (4, "repeat repeat repeat", "s1"),
            (5, "punctuation, and. symbols!", "s0"),
        ],
        "doc_id long, text string, source string",
    )
    from cflog2otel_spark.operators.tokens import tokenize_documents

    rows = {r["doc_id"]: r for r in tokenize_documents(docs).collect()}
    assert rows[0]["tokens"] == _py_tokens("Hello World")
    assert rows[1]["tokens"] == _py_tokens("  padded   whitespace\ttabs ")
    assert rows[2]["tokens"] == [] and rows[2]["n_tok"] == 0
    assert rows[3]["tokens"] == [] and rows[3]["n_tok"] == 0
    t = rows[4]["tokens"]
    assert len(set(t)) == 1 and len(t) == 3
    for r in rows.values():
        assert r["n_tok"] == len(r["tokens"])
        assert all(0 <= x < 50257 for x in r["tokens"])


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # source
            st.integers(min_value=0, max_value=200),  # n_tok
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=64),  # budget
    st.integers(min_value=1, max_value=16),  # chunk_rows
)
def test_pack_sequences_matches_reference(spark, rows, budget, chunk_rows):
    """The distributed two-level prefix scan equals the logical
    single-stream per-source prefix sum for ANY chunk size, and the
    seq_first/seq_last/pos_in_seq arithmetic matches concat-then-chunk."""
    data = [(i, src, n) for i, (src, n) in enumerate(rows)]
    tok = spark.createDataFrame(data, "doc_id long, source string, n_tok int")
    from cflog2otel_spark.operators.tokens import pack_sequences

    got = {
        r["doc_id"]: (
            r["tok_offset"], r["seq_first"], r["seq_last"], r["pos_in_seq"]
        )
        for r in pack_sequences(
            tok, budget=budget, chunk_rows=chunk_rows
        ).collect()
    }
    offsets: dict[str, int] = {}
    for doc_id, src, n in sorted(data):
        off = offsets.get(src, 0)
        want = (
            off,
            off // budget,
            (off + max(n, 1) - 1) // budget,
            off % budget,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        offsets[src] = off + n


def test_pack_sequences_rejects_bad_args(spark):
    from cflog2otel_spark.operators.tokens import pack_sequences

    tok = spark.createDataFrame(
        [(0, "s", 3)], "doc_id long, source string, n_tok int"
    )
    with pytest.raises(ValueError):
        pack_sequences(tok, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(tok, budget=64, chunk_rows=0)


def test_pack_sequences_plan_is_chunk_partitioned(spark):
    """Scale shape: the full-data window must be keyed by (source, chunk),
    never by source alone — a hot source is spread over its chunks. The
    subtotal join must be a broadcast."""
    from cflog2otel_spark.operators.tokens import (
        pack_sequences,
        tokenize_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(tokenize_documents(docs), budget=64)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "_pack_chunk" in plan  # chunk key present in the window spec
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # no window partitioned by source alone: every Window spec that
    # mentions the source column also mentions the chunk key
    for line in plan.splitlines():
        if "Window" in line and "source" in line:
            assert "_pack_chunk" in line, line


def test_bigram_expr_edges(spark):
    from cflog2otel_spark.operators.tokens import bigram_expr

    df = spark.createDataFrame(
        [(0, []), (1, [5]), (2, [5, 7]), (3, [1, 2, 3])],
        "id long, tokens array<int>",
    )
    rows = {
        r["id"]: r["b"]
        for r in df.select("id", bigram_expr("tokens").alias("b")).collect()
    }
    assert rows[0] == [] and rows[1] == []
    assert rows[2] == [5 * 65536 + 7]
    assert rows[3] == [1 * 65536 + 2, 2 * 65536 + 3]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # left events: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=30,
    ),
    st.lists(  # right events: (key, ts) — deduped below
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=30,
    ),
)
def test_asof_join_matches_reference(spark, left_rows, right_rows):
    """Backward-inclusive as-of: for each left row the right row with the
    greatest ts <= left ts on the same key; nulls when none exists."""
    from cflog2otel_spark.operators.joins import asof_join

    right_dedup = {}
    for i, (k, ts) in enumerate(right_rows):
        right_dedup[(k, ts)] = i  # last wins: unique (key, ts)
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)] or [(0, -1, 0)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(rid, k, ts) for (k, ts), rid in right_dedup.items()] or [(0, -1, 0)],
        "rid long, k long, ts long",
    )
    got = {
        r["lid"]: (r["ts_right"], r["rid_right"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["rid"],
        ).collect()
    }
    for i, (k, ts) in enumerate(left_rows or [(-1, 0)]):
        candidates = [
            (rts, rid)
            for (rk, rts), rid in right_dedup.items()
            if rk == k and rts <= ts
        ]
        if not (left_rows or right_rows):
            continue
        want = max(candidates) if candidates else (None, None)
        assert got[i] == want, (i, got[i], want, candidates)


def test_asof_join_plan_single_shuffle(spark):
    """Scale shape: the as-of join plans as union + ONE window shuffle on
    the key — no BroadcastNestedLoopJoin / CartesianProduct (what a naive
    inequality join would produce)."""
    from cflog2otel_spark.operators.joins import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    j = asof_join(left, right, on="user_id", right_cols=["view_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan
    assert plan.count("Window") == 1


def test_sequence_dedup_groups_identical_token_arrays(spark):
    """Planted exact-duplicate sequences collapse to min-id groups; unique
    sequences keep themselves; empty sequences form one group."""
    from cflog2otel_spark.operators.tokens import sequence_dedup

    tok = spark.createDataFrame(
        [
            (0, [1, 2, 3]),
            (1, [1, 2, 3]),     # dup of 0
            (2, [1, 2]),        # prefix is NOT a dup
            (3, []),
            (4, []),            # dup of 3
            (5, [1, 2, 3]),     # dup of 0
            (6, [3, 2, 1]),     # order matters
        ],
        "doc_id long, tokens array<int>",
    )
    rows = {r["doc_id"]: r for r in sequence_dedup(tok).collect()}
    assert {i: r["group_id"] for i, r in rows.items()} == {
        0: 0, 1: 0, 2: 2, 3: 3, 4: 3, 5: 0, 6: 6,
    }
    assert {i for i, r in rows.items() if r["keep"]} == {0, 2, 3, 6}


def test_token_contamination_matches_bruteforce(spark):
    """Hand-checkable n=3 case + a brute-force python recount of distinct
    matched grams per doc."""
    from cflog2otel_spark.operators.tokens import token_ngram_contamination

    seqs = {
        0: [1, 2, 3, 4, 5],        # benchmark doc
        1: [9, 1, 2, 3, 8],        # shares gram (1,2,3)
        2: [3, 4, 5],              # shares gram (3,4,5)
        3: [5, 4, 3, 2, 1],        # reversed: no shared gram
        4: [1, 2],                 # shorter than n: never contaminated
        5: [1, 2, 3, 4, 5],        # identical to benchmark: all 3 grams hit
    }
    tok = spark.createDataFrame(
        [(i, s) for i, s in seqs.items()], "doc_id long, tokens array<int>"
    )
    bench = tok.filter(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in token_ngram_contamination(tok, bench, n=3).collect()
    }

    def grams(s, n=3):
        return {tuple(s[i : i + n]) for i in range(len(s) - n + 1)}

    bg = grams(seqs[0])
    expect = {
        i: (len(grams(s) & bg), len(grams(s) & bg) > 0) for i, s in seqs.items()
    }
    assert got == expect
    with pytest.raises(ValueError):
        token_ngram_contamination(tok, bench, n=0)


def test_token_contamination_plan_broadcasts_benchmark(spark):
    """The benchmark gram set must reach the corpus via a broadcast join —
    a shuffled join on the gram key would move the full corpus gram stream."""
    from cflog2otel_spark.operators.tokens import token_ngram_contamination

    tok = spark.createDataFrame(
        [(i, list(range(i, i + 20))) for i in range(40)],
        "doc_id long, tokens array<int>",
    )
    plan = token_ngram_contamination(
        tok, tok.filter(F.col("doc_id") % 7 == 0), n=13
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_pack_tokens_matches_python_reference(spark, docs_spec, budget):
    """pack_tokens output must equal the logical concat-then-chunk of each
    source's token stream, for random doc sizes and budgets (boundary docs
    spanning several sequences, empty docs, budget=1)."""
    from cflog2otel_spark.operators.tokens import pack_tokens

    rows = [
        (i, src, [(i * 131 + j) % 997 for j in range(n)], n)
        for i, (src, n) in enumerate(docs_spec)
    ]
    tok = spark.createDataFrame(
        rows, "doc_id long, source string, tokens array<int>, n_tok int"
    )
    got = {
        (r["source"], r["seq_id"]): r["tokens"]
        for r in pack_tokens(tok, budget=budget, chunk_rows=4).collect()
    }

    expect = {}
    for src in sorted({s for _, s, _, _ in rows}):
        stream = []
        for i, s, toks, _ in sorted(rows):
            if s == src:
                stream.extend(toks)
        for q in range(0, len(stream), budget):
            expect[(src, q // budget)] = stream[q : q + budget]
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=25,
    ),
    st.integers(min_value=0, max_value=12),
)
def test_asof_join_forward_and_tolerance(spark, left_rows, right_rows, tol):
    """direction='forward' picks the smallest right ts >= left ts;
    tolerance nulls matches farther than the bound — both verified against
    a brute-force reference on random streams."""
    from cflog2otel_spark.operators.joins import asof_join

    right_dedup = {}
    for i, (k, ts) in enumerate(right_rows):
        right_dedup[(k, ts)] = i
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)] or [(0, -1, 0)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(rid, k, ts) for (k, ts), rid in right_dedup.items()] or [(0, -1, 0)],
        "rid long, k long, ts long",
    )
    got = {
        r["lid"]: (r["ts_right"], r["rid_right"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["rid"], direction="forward", tolerance=float(tol),
        ).collect()
    }
    for i, (k, ts) in enumerate(left_rows or [(-1, 0)]):
        candidates = [
            (rts, rid)
            for (rk, rts), rid in right_dedup.items()
            if rk == k and rts >= ts and rts - ts <= tol
        ]
        if not (left_rows or right_rows):
            continue
        want = min(candidates) if candidates else (None, None)
        assert got[i] == want, (i, got[i], want)


def test_asof_join_rejects_bad_args(spark):
    from cflog2otel_spark.operators.joins import asof_join

    df = spark.createDataFrame([(0, 0, 0)], "lid long, k long, ts long")
    with pytest.raises(ValueError):
        asof_join(df, df, on="k", direction="sideways")
    with pytest.raises(ValueError):
        asof_join(df, df, on="k", tolerance=-1.0)


def test_stratified_sample_deterministic_and_validated(spark):
    from cflog2otel_spark.operators.tokens import stratified_sample

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(600)],
        "doc_id long, source string",
    )
    picked = stratified_sample(
        df, {"a": 1.0, "b": 0.5, "c": 0.0}, default_fraction=0.0
    )
    rows = picked.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("a", ())) == 200          # fraction 1.0: all
    assert "c" not in by_src                        # fraction 0.0: none
    assert 60 <= len(by_src.get("b", ())) <= 140    # ~half, hash-determined
    # deterministic: the same call returns the identical id set
    again = {r["doc_id"] for r in stratified_sample(
        df, {"a": 1.0, "b": 0.5, "c": 0.0}, default_fraction=0.0).collect()}
    assert again == {r["doc_id"] for r in rows}
    # growing the corpus never flips an existing row's verdict
    bigger = df.union(spark.createDataFrame(
        [(i, "b") for i in range(600, 900)], "doc_id long, source string"))
    grown = {r["doc_id"] for r in stratified_sample(
        bigger, {"a": 1.0, "b": 0.5, "c": 0.0}, default_fraction=0.0).collect()}
    assert {i for i in grown if i < 600} == again
    with pytest.raises(ValueError):
        stratified_sample(df, {"a": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(df, {}, default_fraction=-0.1)


def test_take_token_budget_matches_python_reference(spark):
    from cflog2otel_spark.operators.tokens import take_token_budget

    rows = [
        (i, ["s0", "s1"][i % 2], (i * 7) % 13 + 1) for i in range(40)
    ]
    tok = spark.createDataFrame(
        [(i, s, list(range(n)), n) for i, s, n in rows],
        "doc_id long, source string, tokens array<int>, n_tok int",
    )
    budgets = {"s0": 30}
    got = {
        r["doc_id"]: r["tok_offset"]
        for r in take_token_budget(
            tok, budgets, default_budget=50, chunk_rows=8
        ).collect()
    }
    offs, expect = {}, {}
    for i, s, n in sorted(rows):
        off = offs.get(s, 0)
        if off < budgets.get(s, 50):
            expect[i] = off
        offs[s] = off + n
    assert got == expect
    # no budget for a source and no default -> keep everything there
    all_s1 = take_token_budget(tok, {"s0": 0}).filter("source = 's1'").count()
    assert all_s1 == sum(1 for _, s, _ in rows if s == "s1")
    assert take_token_budget(tok, {"s0": 0}).filter("source = 's0'").count() == 0


def _py_bpe_merge(seq, a, b, m):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(m)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 4), min_size=0, max_size=20),
        min_size=1, max_size=12,
    ),
    st.integers(0, 4),
    st.integers(0, 4),
)
def test_bpe_merge_step_matches_python(spark, seqs, a, b):
    """Greedy left-to-right non-overlapping merge — both the positional
    (a != b) and the fold (a == b, e.g. [a,a,a] -> [m,a]) paths — vs a
    python reference on random corpora over a tiny alphabet (maximizing
    adjacent collisions)."""
    from cflog2otel_spark.operators.tokens import bpe_merge_step

    tok = spark.createDataFrame(
        [(i, s, len(s)) for i, s in enumerate(seqs)],
        "doc_id long, tokens array<int>, n_tok int",
    )
    got = {
        r["doc_id"]: (r["tokens"], r["n_tok"])
        for r in bpe_merge_step(tok, (a, b), 99).collect()
    }
    for i, s in enumerate(seqs):
        want = _py_bpe_merge(s, a, b, 99)
        assert got[i] == (want, len(want)), (i, s, a, b, got[i], want)


def _py_train_bpe(seqs, n_merges, first_new_id=60000):
    merges, cur = [], [list(s) for s in seqs]
    for k in range(n_merges):
        counts = {}
        for s in cur:
            for i in range(len(s) - 1):
                enc = s[i] * 65536 + s[i + 1]
                counts[enc] = counts.get(enc, 0) + 1
        if not counts:
            break
        best = min(counts, key=lambda e: (-counts[e], e))
        if counts[best] < 2:
            break
        a, b = best // 65536, best % 65536
        m = first_new_id + k
        cur = [_py_bpe_merge(s, a, b, m) for s in cur]
        merges.append((a, b, m))
    return cur, merges


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 3), min_size=0, max_size=14),
        min_size=1, max_size=8,
    ),
    st.integers(0, 3),
)
def test_train_bpe_matches_python(spark, seqs, n_merges):
    """Iterated BPE (pair scoring -> deterministic pick -> merge, per
    round, incl. early stop when no bigram repeats) vs a python trainer.
    Small alphabet so merged ids re-participate in later rounds."""
    from cflog2otel_spark.operators.tokens import train_bpe

    tok = spark.createDataFrame(
        [(i, s, len(s)) for i, s in enumerate(seqs)],
        "doc_id long, tokens array<int>, n_tok int",
    )
    got_df, got_merges = train_bpe(tok, n_merges)
    got = {r["doc_id"]: r["tokens"] for r in got_df.collect()}
    want_seqs, want_merges = _py_train_bpe(seqs, n_merges)
    assert got_merges == want_merges
    assert got == {i: s for i, s in enumerate(want_seqs)}


def test_train_bpe_rejects_bad_args(spark):
    from cflog2otel_spark.operators.tokens import train_bpe

    tok = spark.createDataFrame([(0, [1, 2], 2)],
                                "doc_id long, tokens array<int>, n_tok int")
    with pytest.raises(ValueError):
        train_bpe(tok, -1)
    with pytest.raises(ValueError):
        train_bpe(tok, 10000, first_new_id=60000)


def test_unigram_logprob_hand_case(spark):
    """Tiny hand-computed corpus: freqs {1:3, 2:2, 3:1}, total 6; empty
    docs score NULL with n_tok 0."""
    import math

    from cflog2otel_spark.operators.tokens import unigram_logprob

    tok = spark.createDataFrame(
        [(0, [1, 1, 2]), (1, [1, 2, 3]), (2, [])],
        "doc_id long, tokens array<int>",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(tok).collect()}
    p = {1: 3 / 6, 2: 2 / 6, 3: 1 / 6}
    want0 = round((2 * math.log(p[1]) + math.log(p[2])) / 3, 6)
    want1 = round((math.log(p[1]) + math.log(p[2]) + math.log(p[3])) / 3, 6)
    assert rows[0]["mean_logprob"] == want0
    assert rows[1]["mean_logprob"] == want1
    assert rows[2]["n_tok"] == 0 and rows[2]["mean_logprob"] is None
    # corpus-typical doc scores higher than the rarer-token doc
    assert rows[0]["mean_logprob"] > rows[1]["mean_logprob"]


def test_word_id_exact_for_very_long_words(spark):
    """The tokenizer hash accumulates in BIGINT with a running pmod, so it
    matches exact-integer arithmetic for ANY word length — the old DOUBLE
    accumulator diverged past ~1,300 chars / 2^53 (ADVICE r5)."""
    from cflog2otel_spark.operators.tokens import tokenize_documents

    words = ["x" * 5000, "Z" * 1301 + "q" * 2000, "a"]
    docs = spark.createDataFrame(
        [(i, w, "s") for i, w in enumerate(words)],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r["tokens"] for r in tokenize_documents(docs).collect()}
    for i, w in enumerate(words):
        assert rows[i] == [_py_word_id(w.lower())], (i, len(w))


def test_tokenize_documents_single_tokenizer_eval(spark):
    """n_tok derives from the aliased tokens column, so the optimized plan
    holds exactly ONE tokenizer fold (VERDICT r5 minor: the old single
    select evaluated tokens_expr twice and relied on codegen subexpression
    elimination that higher-order functions don't get)."""
    from cflog2otel_spark.operators.tokens import tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        tokenize_documents(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("ascii(") == 1, plan


def test_pack_tokens_respects_tokens_col_name(spark):
    """pack_tokens must slice the CALLER-NAMED tokens column (ADVICE r5:
    the slice expr hardcoded `tokens`); also guards against picking up an
    unrelated column that happens to be named `tokens`."""
    from cflog2otel_spark.operators.tokens import pack_tokens

    df = spark.createDataFrame(
        [(0, "s", [1, 2, 3], [9, 9], 3), (1, "s", [4, 5], [9, 9], 2)],
        "doc_id long, source string, toks array<int>, tokens array<int>, n_tok int",
    )
    out = {
        r["seq_id"]: r["tokens"]
        for r in pack_tokens(df, budget=4, tokens_col="toks").collect()
    }
    assert out == {0: [1, 2, 3, 4], 1: [5]}


def test_asof_join_null_right_payload_not_stitched(spark):
    """A right row with a NULL payload value must match as-is — NOT get
    that column stitched from an OLDER right row (ADVICE r5: per-column
    last(ignorenulls) carries). And right rows with NULL ts are ignored
    entirely instead of leaking their payload."""
    from cflog2otel_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(0, 1, 10), (1, 1, 30)], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, "old-payload"), (1, 25, None), (1, None, "null-ts-leak")],
        "k long, ts long, payload string",
    )
    got = {
        r["lid"]: (r["ts_right"], r["payload_right"])
        for r in asof_join(
            left, right, on="k", right_cols=["payload"]
        ).collect()
    }
    # lid 0: only the ts=5 row is at-or-before -> its payload
    assert got[0] == (5, "old-payload")
    # lid 1: nearest is ts=25 whose payload IS null -> carry the null,
    # not "old-payload" from ts=5, and never "null-ts-leak"
    assert got[1] == (25, None)


def test_asof_join_null_left_ts_never_matches(spark):
    from cflog2otel_spark.operators.joins import asof_join

    left = spark.createDataFrame([(0, 1, None)], "lid long, k long, ts long")
    right = spark.createDataFrame([(1, 5, 7)], "k long, ts long, rid long")
    for direction in ("backward", "forward"):
        rows = asof_join(
            left, right, on="k", right_cols=["rid"], direction=direction
        ).collect()
        assert rows[0]["ts_right"] is None and rows[0]["rid_right"] is None


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=0, max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=0, max_size=40,
    ),
    st.sampled_from(["backward", "forward"]),
    st.sampled_from([None, 7.0]),
    st.sampled_from([1.0, 8.0, 1000.0]),
)
def test_asof_join_chunked_matches_unchunked(
    spark, left_rows, right_rows, direction, tol, span
):
    """The two-level chunked merge (skew path) is output-identical to the
    single-level window for every direction/tolerance/chunk-span combo."""
    from cflog2otel_spark.operators.joins import asof_join

    right_dedup = {}
    for i, (k, ts) in enumerate(right_rows):
        right_dedup[(k, ts)] = i
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)] or [(0, -1, 0)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(rid, k, ts) for (k, ts), rid in right_dedup.items()] or [(0, -1, 0)],
        "rid long, k long, ts long",
    )
    kwargs = dict(
        on="k", left_ts="ts", right_ts="ts", right_cols=["rid"],
        direction=direction, tolerance=tol,
    )
    base = {
        r["lid"]: (r["ts_right"], r["rid_right"])
        for r in asof_join(left, right, **kwargs).collect()
    }
    chunked = {
        r["lid"]: (r["ts_right"], r["rid_right"])
        for r in asof_join(left, right, chunk_span=span, **kwargs).collect()
    }
    assert chunked == base


def test_asof_join_chunked_plan_partitions_by_chunk(spark):
    """Skew shape: with chunk_span set, the full-data merge window
    partitions by (key, chunk) — a hot key's history is bounded per time
    bucket — and the plan still has no BNLJ/Cartesian."""
    from cflog2otel_spark.operators.joins import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    j = asof_join(
        left, right, on="user_id", right_cols=["view_id"], chunk_span=3600.0
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_asof_chunk" in plan
