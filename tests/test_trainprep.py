"""Training-prep operators (ops/trainprep.py): FIM reordering must be
losslessly invertible, chat-template rendering must be order-stable,
and loss-mask spans must slice the rendered string to exactly each
assistant turn's text."""
import re


def test_fim_transform_is_invertible(spark):
    from pdfminer_spark.ops.trainprep import fim_transform

    rows = fim_transform(spark, "/root/testdata/sf0.001").collect()
    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()}
    pat = re.compile(r"^<PRE>(.*)<SUF>(.*)<MID>(.*)$", re.S)
    n_fim = 0
    for r in rows:
        if r["fim_applied"]:
            m = pat.match(r["out_text"])
            assert m, r["doc_id"]
            (pre, suf, mid) = m.groups()
            assert pre + mid + suf == docs[r["doc_id"]]
            n_fim += 1
        else:
            assert r["out_text"] == docs[r["doc_id"]]
    assert n_fim == sum(1 for d in docs if d % 2 == 0)


def test_loss_mask_spans_slice_rendered_exactly(spark):
    from pdfminer_spark.ops.trainprep import (_conv_turns, chat_template,
                                              loss_mask_spans)

    sf = "/root/testdata/sf0.001"
    rendered = {r["conv_id"]: r["rendered"]
                for r in chat_template(spark, sf).collect()}
    turns = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in _conv_turns(spark, sf).collect()}
    spans = loss_mask_spans(spark, sf).collect()
    assert spans, "no assistant turns found"
    for r in spans:
        s = rendered[r["conv_id"]]
        assert (s[r["span_start"]:r["span_end"]]
                == turns[(r["conv_id"], r["turn_idx"])])
        # the mask never covers role headers or turn terminators
        assert s[r["span_start"] - 1] == "\n"
        assert s[r["span_end"]:r["span_end"] + 7] == "<|end|>"


def test_chat_template_plan_is_one_exchange(spark):
    from pdfminer_spark.ops.trainprep import chat_template, fim_transform

    plan = chat_template(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    fim_plan = fim_transform(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fim_plan  # pure projection, zero shuffles


def test_context_truncate_keeps_longest_fitting_suffix(spark):
    from pdfminer_spark.ops.trainprep import (_CONTEXT_BUDGET,
                                              context_truncate)

    rows = context_truncate(spark, "/root/testdata/sf0.001").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for turns in by_conv.values():
        turns.sort(key=lambda r: r["turn_idx"])
        kept = [bool(r["kept"]) for r in turns]
        # keep set is a suffix: once kept, every later turn is kept
        assert kept == sorted(kept)
        # every kept turn fits; the newest turn before the cut would not
        for r in turns:
            assert bool(r["kept"]) == (r["suffix_chars"]
                                       <= _CONTEXT_BUDGET)


def _merge_ref(tokens, a, b):
    """Reference greedy left-to-right BPE merge application."""
    out = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + "_" + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _merge_via_replace(text, a, b):
    """The double-space REPLACE trick bpe_train_merges runs in both
    engines, replicated with str.replace (same leftmost
    non-overlapping semantics as Spark/DuckDB REPLACE)."""
    spaced = " " + text.replace(" ", "  ") + " "
    merged = spaced.replace(" %s  %s " % (a, b), " %s_%s " % (a, b))
    return merged.replace("  ", " ").strip()


def test_bpe_double_space_merge_matches_reference():
    import itertools
    import random

    rng = random.Random(7)
    alpha = ["x", "y", "xy", "yx"]  # tokens that are substrings of
    # each other — the case plain substring replace would corrupt
    for trial in range(500):
        toks = [rng.choice(alpha) for _ in range(rng.randint(1, 12))]
        (a, b) = (rng.choice(alpha), rng.choice(alpha))
        want = " ".join(_merge_ref(toks, a, b))
        got = _merge_via_replace(" ".join(toks), a, b)
        assert got == want, (toks, a, b, got, want)
    # every ordered pair over the alphabet, exhaustive short sequences
    for toks in itertools.product(alpha, repeat=4):
        for (a, b) in itertools.product(alpha, repeat=2):
            want = " ".join(_merge_ref(list(toks), a, b))
            got = _merge_via_replace(" ".join(toks), a, b)
            assert got == want, (toks, a, b)


def test_bpe_train_merges_rounds_interlock(spark):
    """Round r's winning pair must be the argmax over the corpus WITH
    rounds 0..r-1 applied — recompute round 1 from round 0's merge and
    compare."""
    from pdfminer_spark.ops.trainprep import bpe_train_merges

    rows = {r["merge_round"]: r for r in
            bpe_train_merges(spark, "/root/testdata/sf0.001").collect()}
    assert len(rows) == 3
    docs = [r["text"] for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()]
    from collections import Counter

    def top_pair(texts):
        c = Counter()
        for t in texts:
            w = t.split(" ")
            for i in range(len(w) - 1):
                c[(w[i], w[i + 1])] += 1
        return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    ((a0, b0), c0) = top_pair(docs)
    assert (rows[0]["a"], rows[0]["b"], rows[0]["pair_count"]) == (a0, b0, c0)
    merged = [_merge_via_replace(t, a0, b0) for t in docs]
    ((a1, b1), c1) = top_pair(merged)
    assert (rows[1]["a"], rows[1]["b"], rows[1]["pair_count"]) == (a1, b1, c1)
