"""Dataset-prep operator tests: PII redaction on seeded content,
sampling determinism, chunk packing overlap invariants."""
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    rows = [
        (0, "contact alice.smith+x@example.co.uk or call +1 (415) 555-0100"),
        (1, "server at 192.168.1.254 responded; mail root@host.io"),
        (2, "no sensitive content here at all"),
    ]
    d = tmp_path_factory.mktemp("piidocs")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet")
    return str(d)


def test_pii_scrub_redacts(spark, pii_dir):
    from pdfminer_spark.ops.datasetops import pii_scrub

    out = {r["doc_id"]: r for r in pii_scrub(spark, pii_dir).collect()}
    assert "<EMAIL>" in out[0]["clean_text"]
    assert "<PHONE>" in out[0]["clean_text"]
    assert "alice" not in out[0]["clean_text"]
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert "<IP>" in out[1]["clean_text"] and out[1]["n_ips"] == 1
    assert out[1]["n_emails"] == 1
    assert out[2]["clean_text"] == "no sensitive content here at all"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)


def test_stratified_sample_deterministic_and_rated(spark):
    from pdfminer_spark.ops.datasetops import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in stratified_sample(spark, SF_DIR).collect()}
    assert a == b  # content-derived: identical on re-run
    rows = stratified_sample(spark, SF_DIR).collect()
    by_stratum = {}
    for r in rows:
        by_stratum.setdefault(r["stratum"], 0)
        by_stratum[r["stratum"]] += 1
    # stratum 0 keeps everything (~167 docs of 500); 1 about half; 2 ~10%
    assert by_stratum[0] > by_stratum[1] > by_stratum[2]
    assert all(r["ticket"] < 100 for r in rows)


def test_pack_chunks_overlap_reconstructs(spark):
    from pdfminer_spark.ops.datasetops import (_CHUNK_STRIDE, _CHUNK_TOKENS,
                                               pack_chunks)

    rows = pack_chunks(spark, SF_DIR).collect()
    docs = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(r)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    texts = {r["doc_id"]: r["text"].split() for r in d}
    for (doc_id, chunks) in list(docs.items())[:50]:
        chunks.sort(key=lambda r: r["chunk_idx"])
        words = texts[doc_id]
        for c in chunks:
            start = c["chunk_idx"] * _CHUNK_STRIDE
            expect = words[start:start + _CHUNK_TOKENS]
            assert c["chunk_text"].split() == expect
            assert c["n_tokens"] == len(expect) > 0
        # full coverage: the last chunk reaches the document's end
        last = chunks[-1]
        assert last["chunk_idx"] * _CHUNK_STRIDE + last["n_tokens"] == len(words)


def test_contamination_check_flags_overlap(spark, tmp_path):
    from pdfminer_spark.ops.datasetops import contamination_check

    bench_text = "the quick brown fox jumps over the lazy dog tonight again"
    rows = [
        (7, bench_text),                                   # eval doc
        (1, "prefix words " + bench_text + " suffix words"),  # contaminated
        (2, " ".join("clean%d" % i for i in range(30))),      # clean
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in
           contamination_check(spark, str(tmp_path)).collect()}
    assert 1 in out and out[1]["n_contaminated"] >= 1
    assert 2 not in out          # clean doc never flagged
    assert 7 not in out          # the eval doc itself is not training data


def test_normalize_text_reference_mapping(spark, tmp_path):
    """latin2ascii parity (reference tools/latin2ascii.py): accents
    expand to char+diacritic-mark, ligatures to their letters, ss for
    sharp-s; unmapped codepoints (here the multiplication sign) pass
    through; n_mapped counts mapped codepoints only. The registered
    query decorates 'and' -> 'åñß×' first (the sf corpus is ASCII), so
    the fixture includes one row exercising that path too."""
    import pandas as pd

    rows = [
        (0, "Çà et là — sûr! ﬁn ﬂouß ×"),
        (1, "band width"),         # 'and' -> 'åñß×' -> 'a%n~ss×'
        (2, "plain ascii only"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet")
    from pdfminer_spark.ops.datasetops import normalize_text

    out = {r["doc_id"]: r for r in
           normalize_text(spark, str(tmp_path)).collect()}
    # note 0x00fb -> 'u~' (not 'u^'): reference quirk, reproduced
    assert out[0]["ascii_text"] == "C,a` et la` -- su~r! fin flouss ×"
    assert out[0]["n_mapped"] == 8
    assert out[1]["ascii_text"] == "ba%n~ss× width"
    assert out[1]["n_mapped"] == 3
    assert out[2]["ascii_text"] == "plain ascii only"
    assert out[2]["n_mapped"] == 0


def test_pack_sequences_bin_boundaries(spark, tmp_path):
    """A doc belongs to the bin its FIRST token falls in (exclusive
    running count // window); packing is per-source shard."""
    import pandas as pd

    # window = 512; doc sizes chosen to straddle the boundary
    rows = [
        (0, " ".join("a%d" % i for i in range(500)), "s1"),  # starts 0   -> bin 0
        (1, " ".join("b%d" % i for i in range(20)),  "s1"),  # starts 500 -> bin 0
        (2, " ".join("c%d" % i for i in range(10)),  "s1"),  # starts 520 -> bin 1
        (3, " ".join("d%d" % i for i in range(600)), "s2"),  # other shard: bin 0
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    from pdfminer_spark.ops.datasetops import pack_sequences

    got = {(r["source"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
           for r in pack_sequences(spark, str(tmp_path)).collect()}
    assert got[("s1", 0)] == (2, 520)   # docs 0 and 1
    assert got[("s1", 1)] == (1, 10)    # doc 2 starts past the boundary
    assert got[("s2", 0)] == (1, 600)   # shards pack independently


def test_decontaminate_spans_excises_only_covered_tokens(spark, tmp_path):
    from pdfminer_spark.ops.datasetops import decontaminate_spans

    bench_text = "the quick brown fox jumps over the lazy dog"  # 9 words
    clean = " ".join("clean%d" % i for i in range(30))
    rows = [
        (7, bench_text),                                      # eval doc
        (1, "prefix words here " + bench_text + " tail words here now"),
        (2, clean),                                           # untouched
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in
           decontaminate_spans(spark, str(tmp_path)).collect()}
    assert 7 not in out  # eval docs are not training rows
    # doc 2 untouched
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == clean
    # doc 1: the 9 bench tokens form 2 shared 8-grams covering exactly
    # those 9 positions; prefix and tail tokens survive in order
    r = out[1]
    assert r["n_tokens"] == 16
    assert r["n_removed"] == 9
    assert r["clean_text"] == "prefix words here tail words here now"


def test_conversation_pack_never_crosses_conversations(spark):
    from pdfminer_spark.ops.datasetops import (_CONV_WINDOW,
                                               conversation_pack)

    rows = conversation_pack(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # contiguous turn span inside ONE conversation per pack
        assert r["turn_lo"] <= r["turn_hi"]
        # a pack exceeds the budget only by its single boundary turn:
        # every pack's START is under the budget by construction
        assert r["pack_id"] * _CONV_WINDOW <= \
            r["pack_id"] * _CONV_WINDOW + r["pack_tokens"]
    # packs per conversation are dense 0..k and turn ranges do not overlap
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for (conv, packs) in by_conv.items():
        packs.sort(key=lambda r: r["pack_id"])
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        for (a, b) in zip(packs, packs[1:]):
            assert a["turn_hi"] < b["turn_lo"]


def test_holdout_split_deterministic_and_proportioned(spark):
    from pdfminer_spark.ops.datasetops import holdout_split

    first = holdout_split(spark, SF_DIR).collect()
    counts: dict = {}
    for r in first:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert 0 <= r["ticket"] < 100
    n = sum(counts.values())
    # 95/4/1 within hash-sampling tolerance at n=500
    assert counts["train"] / n > 0.88
    assert 0 < counts.get("val", 0) < 0.12 * n
    assert counts.get("test", 0) < 0.06 * n
    again = holdout_split(spark, SF_DIR).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))


def test_turn_role_stats_roles_partition_turns(spark):
    from pdfminer_spark.ops.datasetops import turn_role_stats

    rows = turn_role_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_user"] + r["n_assistant"] + r["n_tool"] == r["n_turns"]
        assert abs(r["tool_ratio"] - r["n_tool"] / r["n_turns"]) < 1e-3


def test_contamination_bloom_equals_exact_and_prefilters(spark):
    """The Bloom prefilter must be output-identical to the exact
    operator (it only cuts candidate volume; an exact join confirms
    survivors), and the prefilter must actually prefilter: Bloom
    survivors are a small superset of true hits, far below the full
    training gram volume."""
    from pyspark.sql import functions as F

    from pdfminer_spark.ops.datasetops import (_BLOOM_BITS, _BLOOM_K,
                                               _docs, _gram_hashes,
                                               contamination_bloom,
                                               contamination_check)
    from tests.conftest import SF_DIR

    exact = {tuple(r) for r in contamination_check(spark, SF_DIR).collect()}
    bloom = {tuple(r) for r in contamination_bloom(spark, SF_DIR).collect()}
    assert bloom == exact

    # prefilter effectiveness: survivors <= true hits + fp bound
    d = _docs(spark, SF_DIR)
    grams = d.select("doc_id", _gram_hashes().alias("grams"))
    n_train_grams = (grams.where(F.col("doc_id") % 100 != 7)
                     .select(F.explode("grams")).count())
    n_bench = (grams.where(F.col("doc_id") % 100 == 7)
               .select(F.explode("grams").alias("g")).distinct().count())
    n_true_hits = sum(r[2] for r in exact)
    import math
    fp_rate = (1 - math.exp(-_BLOOM_K * n_bench / _BLOOM_BITS)) ** _BLOOM_K
    # survivors can't be counted from the public surface; bound check:
    # expected survivors ~ true hits + fp_rate * train grams, and that
    # must be well under the unfiltered volume the exact op joins
    assert n_true_hits + fp_rate * n_train_grams < 0.2 * n_train_grams


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    """DSIR semantics: a raw document built from the target slice's
    vocabulary outscores one from disjoint vocabulary (its hashed
    bigrams fall in buckets the target model favors)."""
    import os

    import pandas as pd

    from pdfminer_spark.ops.datasetops import dsir_weights

    target_text = " ".join("targ%d" % (i % 6) for i in range(40))
    like = " ".join("targ%d" % ((i + 3) % 6) for i in range(40))
    unlike = " ".join("off%d" % i for i in range(40))
    rows = [(7, target_text),      # doc_id % 100 == 7 -> target slice
            (107, target_text),    # second target doc
            (1, like), (2, unlike)]
    d = tmp_path / "docs"
    d.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r for r in dsir_weights(spark, str(d)).collect()}
    assert set(got) == {1, 2}  # target docs are the model, not scored
    assert got[1]["log_weight"] > got[2]["log_weight"]
    assert got[1]["weight_decile"] < got[2]["weight_decile"]


def test_url_canonicalize_rules(spark):
    """RFC 3986 normalization semantics, checked against hand-computed
    expectations for specific doc_ids (the synthesis is deterministic in
    doc_id, so expected strings are derivable by hand):

    - scheme+host lowercased
    - default port dropped iff it matches the scheme (http:80, https:443)
    - non-default port kept
    - fragment dropped
    - utm_* params dropped, survivors sorted
    """
    from pdfminer_spark.ops.datasetops import url_canonicalize
    got = {r["doc_id"]: (r["url"], r["url_canonical"])
           for r in url_canonicalize(spark, SF_DIR).collect()}

    for doc_id, (raw, canon) in got.items():
        # fragment and tracking params never survive
        assert "#" not in canon and "utm_" not in canon
        # scheme/host lowercase
        assert canon.split("://")[0] in ("http", "https")
        assert ".com" in canon and "Example" not in canon
        # every raw URL here carries an explicit port; it survives
        # canonicalization iff non-default for the (lowercased) scheme
        scheme = canon.split("://")[0]
        port = raw.split("://")[1].split("/")[0].split(":")[1]
        if (scheme, port) in (("http", "80"), ("https", "443")):
            assert ":" not in canon.split("://")[1].split("/")[0]
        else:
            assert f":{port}" in canon

    # doc_id=0: HTTP scheme variant index (0%4+1)=1 -> 'http', port
    # (0%3+1)=1 -> ':80' (default, dropped), query variant 1 ->
    # 'utm_source=feed&id=0', frag doc_id%5==0 -> '#sec0'
    raw0, canon0 = got[0]
    assert raw0 == "http://WWW.Example0.COM:80/Docs/page0?utm_source=feed&id=0#sec0"
    assert canon0 == "http://www.example0.com/Docs/page0?id=0"

    # doc_id=2: scheme idx 3 -> 'https', port idx 3 -> ':8080' (kept),
    # query variant 3 -> 'b=2&utm_campaign=x&a=1&id=2' -> sorted 'a=1&b=2&id=2'
    raw2, canon2 = got[2]
    assert raw2 == "https://WWW.Example2.COM:8080/Docs/page2?b=2&utm_campaign=x&a=1&id=2"
    assert canon2 == "https://www.example2.com:8080/Docs/page2?a=1&b=2&id=2"


def test_shard_assign_invariants(spark):
    """Byte-budgeted sharding invariants: offsets are the exact prefix
    sum of byte lengths in (source, doc_id) order (no gaps, no overlap),
    and every shard except possibly the last stays within budget + one
    document (a doc that straddles a 4096 boundary belongs to the shard
    its FIRST byte falls in)."""
    from pdfminer_spark.ops.datasetops import _SHARD_BYTES, shard_assign
    rows = sorted(((r["source"], r["doc_id"], r["n_bytes"],
                    r["global_start"], r["shard_id"])
                   for r in shard_assign(spark, SF_DIR).collect()))
    acc = 0
    for (_, _, n_bytes, start, shard_id) in rows:
        assert start == acc           # exact prefix sum, no gaps
        assert shard_id == start // _SHARD_BYTES
        acc += n_bytes
    # balance: every shard's byte mass is within budget plus one
    # straddling document
    per_shard = {}
    for (_, _, n_bytes, _, shard_id) in rows:
        per_shard[shard_id] = per_shard.get(shard_id, 0) + n_bytes
    max_doc = max(r[2] for r in rows)
    assert len(per_shard) >= 2  # the corpus actually spans shards
    for (sid, total) in per_shard.items():
        assert total <= _SHARD_BYTES + max_doc


def test_dedup_url_keeps_one_per_canonical_group(spark):
    """URL dedup invariants at the test SF: exactly one kept doc per
    canonical URL (the min doc_id), n_dups equals the true group size,
    collisions actually occur (the coarser synthesis guarantees
    multi-member groups), and every canonical form is fully
    normalized (lowercase, no :80, no utm_*, no fragment)."""
    import re
    from collections import Counter

    from pdfminer_spark.ops.datasetops import dedup_url

    rows = dedup_url(spark, SF_DIR).collect()
    assert rows
    groups = Counter(r["url_canonical"] for r in rows)
    assert max(groups.values()) >= 2  # collisions exist at test scale
    kept = {}
    for r in rows:
        assert r["n_dups"] == groups[r["url_canonical"]], r
        assert re.fullmatch(
            r"http://www\.example\d\.com/p\d+\?id=\d+",
            r["url_canonical"]), r
        if r["is_kept"]:
            kept.setdefault(r["url_canonical"], []).append(r["doc_id"])
    assert set(kept) == set(groups)  # one kept entry per group...
    min_ids = {}
    for r in rows:
        k = r["url_canonical"]
        min_ids[k] = min(min_ids.get(k, r["doc_id"]), r["doc_id"])
    for k, ids in kept.items():
        assert ids == [min_ids[k]], k  # ...and it is the min doc_id


def test_decompress_payload_roundtrip_and_bounds():
    import bz2
    import lzma
    import zlib

    import pytest

    from pdfminer_spark.ops.datasetops import (PayloadError,
                                               decompress_payload)

    raw = b"the quick brown fox " * 500
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    cases = [("gzip", c.compress(raw) + c.flush()),
             ("zlib", zlib.compress(raw, 6)),
             ("bz2", bz2.compress(raw, 1)),
             ("xz", lzma.compress(raw, format=lzma.FORMAT_XZ))]
    for (want_fmt, payload) in cases:
        (fmt, out) = decompress_payload(payload)
        assert (fmt, out) == (want_fmt, raw)
        # truncated stream raises (no partial data returned)
        with pytest.raises(PayloadError):
            decompress_payload(payload[:len(payload) // 2])
    # unknown magic raises
    with pytest.raises(PayloadError, match="magic"):
        decompress_payload(b"\x00\x01\x02\x03")
    # decompression bomb: ~64 KB of zlib expanding to 64 MiB must raise
    # at the cap without allocating the full output
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)
    assert len(bomb) < 100_000
    with pytest.raises(PayloadError, match="cap"):
        decompress_payload(bomb, cap=1 << 20)
    # corrupt-but-sniffable gzip raises PayloadError, not zlib.error
    with pytest.raises(PayloadError, match="corrupt|truncated"):
        decompress_payload(b"\x1f\x8b" + b"\xff" * 40)


def test_repair_mojibake_rounds_and_bounds():
    from pdfminer_spark.ops.datasetops import repair_mojibake

    clean = "café résumé naïve"
    once = clean.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert repair_mojibake(clean) == (clean, 0)
    assert repair_mojibake(once) == (clean, 1)
    assert repair_mojibake(twice) == (clean, 2)
    # pure ASCII is untouched
    assert repair_mojibake("plain ascii text") == ("plain ascii text", 0)
    # non-latin-1-encodable text (already proper unicode) passes through
    assert repair_mojibake("中文 text") == ("中文 text", 0)
    # round cap bounds adversarial self-similar inputs
    deep = clean
    for _ in range(9):
        deep = deep.encode("utf-8").decode("latin-1")
    (out, rounds) = repair_mojibake(deep, max_rounds=4)
    assert rounds == 4 and out != clean


def test_unicode_normalize_agrees_with_duckdb_nfc():
    """Two independent NFC implementations (CPython unicodedata vs
    DuckDB NFC_NORMALIZE) must agree on composition, mark ordering,
    and Hangul — the cross-engine property the oracle gate relies on."""
    import duckdb
    import unicodedata

    con = duckdb.connect()
    cases = [
        "á",              # a + combining acute -> U+00E1
        "ȩ́",        # two marks: canonical reordering
        "각",   # Hangul jamo -> syllable GAK
        "éalready",        # precomposed passes through
        "plain ascii",
    ]
    for s in cases:
        got = con.execute("SELECT NFC_NORMALIZE(?)", [s]).fetchone()[0]
        assert got == unicodedata.normalize("NFC", s), repr(s)
        # idempotence
        assert unicodedata.normalize(
            "NFC", unicodedata.normalize("NFC", s)) \
            == unicodedata.normalize("NFC", s)


def test_decompress_payload_concatenated_members():
    """warc.gz writes one gzip member per record — concatenated members
    must inflate to the full byte stream, still under the total cap."""
    import bz2
    import lzma
    import zlib

    import pytest

    from pdfminer_spark.ops.datasetops import (PayloadError,
                                               decompress_payload)

    def gz(raw):
        c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return c.compress(raw) + c.flush()

    parts = [b"WARC record one " * 10, b"record two " * 20, b"three"]
    (fmt, out) = decompress_payload(b"".join(gz(p) for p in parts))
    assert (fmt, out) == ("gzip", b"".join(parts))
    (fmt, out) = decompress_payload(
        bz2.compress(parts[0], 1) + bz2.compress(parts[1], 1))
    assert (fmt, out) == ("bz2", parts[0] + parts[1])
    (fmt, out) = decompress_payload(
        lzma.compress(parts[0]) + lzma.compress(parts[1]))
    assert (fmt, out) == ("xz", parts[0] + parts[1])
    # the cap covers the TOTAL across members
    big = gz(b"\x00" * 900_000) * 3
    with pytest.raises(PayloadError, match="cap"):
        decompress_payload(big, cap=1_000_000)
    # a truncated trailing member still raises
    two = gz(parts[0]) + gz(parts[1])
    with pytest.raises(PayloadError):
        decompress_payload(two[:len(two) - 4])
