"""Near-dup sketch operators: MinHash-LSH (planted duplicates must surface),
SimHash block buckets, phash near-dup pairs on the image fixture."""

import pytest
from pyspark.sql import functions as F

from auto_archiver_spark.operators.dedup import (
    dedup_exact_content,
    minhash_dedup,
    minhash_lsh_candidates,
    phash_near_dup_pairs,
    simhash_buckets,
)
from auto_archiver_spark.sources.fixture import images_df


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "spark dataframes shuffle partitions broadcast joins skew salting adaptive",
        "completely different text about gardens flowers bees honey and summer rain",
        "url frontier politeness robots crawl delay token bucket admission window",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
        rows.append((100 + i, t))  # exact duplicate -> jaccard 1.0
    rows.append((200, base[0].replace("today", "tomorrow")))  # near-dup of 0
    rows.append((201, "one two"))  # shorter than a shingle
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_finds_exact_duplicates(docs):
    cands = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(docs).collect()}
    for i in range(4):
        assert (i, 100 + i) in cands, f"planted duplicate {i} missed"


def test_minhash_dedup_verifies_with_true_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_dedup(docs, threshold=0.5).collect()}
    for i in range(4):
        assert pairs.get((i, 100 + i)) == 1.0
    # the near-dup pair (0,200) has high but sub-1 jaccard if surfaced
    if (0, 200) in pairs:
        assert 0.5 <= pairs[(0, 200)] < 1.0
    # unrelated docs never pass the verify stage
    assert (0, 1) not in pairs and (1, 2) not in pairs


def test_simhash_identical_docs_share_all_blocks(docs):
    rows = simhash_buckets(docs).collect()
    sig = {}
    for r in rows:
        sig.setdefault(r.id, {})[r.block] = r.val
    for i in range(4):
        assert sig[i] == sig[100 + i]
    assert sig[0] != sig[2]
    assert {r.block for r in rows} == {0, 1, 2, 3}


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """A boilerplate clique (300 identical docs) must NOT expand
    quadratically: oversized buckets emit O(m) star pairs that still connect
    every member to the min-id representative."""
    txt = "identical boilerplate text repeated across the corpus every day"
    rows = [(i, txt) for i in range(300)] + [(1000, "something else entirely here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, bucket_cap=64).collect()
    # all-pairs would be 300*299/2 = 44850; star is 299
    assert len(pairs) == 299
    assert all(r.id_a == 0 for r in pairs)  # rep = min id
    assert {r.id_b for r in pairs} == set(range(1, 300))  # connectivity kept
    # small buckets still get exact all-pairs
    small = spark.createDataFrame([(i, txt) for i in range(5)], "doc_id long, text string")
    assert len(minhash_lsh_candidates(small, bucket_cap=64).collect()) == 10


def test_connected_components_chains_and_cliques(spark):
    """Min-label propagation: multi-hop chains converge to the chain's min
    id (needs >1 round), disjoint cliques stay separate."""
    from auto_archiver_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_phash_near_dup_pairs_on_fixture(spark):
    imgs = images_df(spark, 130, partitions=4).localCheckpoint()
    pairs = phash_near_dup_pairs(imgs, max_hamming=3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # i=60 is a near-dup (1px noise) of i=59; i=96 an exact dup of i=95
    assert ("img_00000059", "img_00000060") in found
    assert ("img_00000095", "img_00000096") in found
    for r in pairs:
        assert r.hamming <= 3


def test_exact_content_dedup_on_fixture(spark):
    imgs = images_df(spark, 130, partitions=4)
    deduped = dedup_exact_content(imgs)
    assert deduped.groupBy("sha256").count().filter("count > 1").isEmpty()
    # the exact duplicate img_96 is dropped, its source 95 kept
    ids = {r.image_id for r in deduped.select("image_id").collect()}
    assert "img_00000095" in ids and "img_00000096" not in ids


def test_ngram_jaccard_shuffle_path_matches_broadcast(docs):
    """VERDICT r2 #7: the over-threshold (no-broadcast) path must produce the
    same verified pairs as the broadcast fast path."""
    from auto_archiver_spark.operators.dedup import ngram_jaccard

    cands = minhash_lsh_candidates(docs).localCheckpoint()
    bc = {(r.id_a, r.id_b, round(r.jaccard, 9))
          for r in ngram_jaccard(docs, cands, broadcast_pairs=True).collect()}
    sh = {(r.id_a, r.id_b, round(r.jaccard, 9))
          for r in ngram_jaccard(docs, cands, broadcast_pairs=False).collect()}
    assert bc == sh and len(bc) > 0
    # the shuffle path carries no broadcast hint in its analyzed plan
    plan = ngram_jaccard(docs, cands, broadcast_pairs=False)._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in plan.lower()


def test_capped_bucket_cluster_consumption(spark):
    """ADVICE r2: over-cap buckets star-sample, so cluster membership must be
    read via connected components on UNVERIFIED candidates — every member of
    a 12-identical-doc clique lands in ONE component even with bucket_cap=4."""
    from auto_archiver_spark.operators.dedup import minhash_dedup_clusters

    text = "identical boilerplate page footer about cookies privacy terms contact us"
    rows = [(i, text) for i in range(12)] + [(50, "something else entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    comp = {r.id: r.component
            for r in minhash_dedup_clusters(df, bucket_cap=4).collect()}
    assert {comp[i] for i in range(12)} == {0}  # one cluster, rep = min id
    assert 50 not in comp  # no candidate edges for the singleton


def test_phash_bucket_cap_star_pairs(spark):
    """Over-cap phash buckets star-sample (screenshot-farm guard): identical
    phashes stay fully connected through the representative at hamming 0."""
    from auto_archiver_spark.operators.dedup import phash_near_dup_pairs

    rows = [(f"img-{i:03d}", 0x1234ABCD5678EF00) for i in range(10)]
    rows.append(("img-zzz", 0x1234ABCD5678EF03))  # hamming 2 from the clique
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = phash_near_dup_pairs(df, max_hamming=3, bucket_cap=4).collect()
    edges = {(r.id_a, r.id_b) for r in pairs}
    # star shape: every clique member connects to the min-id rep
    rep = "img-000"
    for i in range(1, 10):
        assert (rep, f"img-{i:03d}") in edges
    # no O(m^2) expansion among non-rep members
    assert not any(a != rep and b != rep and a.startswith("img-0") and b.startswith("img-0")
                   for a, b in edges)
    # the hamming-2 neighbor still pairs with the rep
    assert (rep, "img-zzz") in edges


def test_hashed_shingle_combiner_no_periodic_cancellation(spark):
    """r4 ADVICE regression: the old xor-rotate mix used rotation
    (7j+1)%63, which repeats with period 9, so a window whose j-th and
    (j+9)-th words were equal hashed identically regardless of WHICH word
    they were. The xxhash64 window combiner must distinguish them."""
    from auto_archiver_spark.operators.dedup import hashed_word_ngrams_df

    mid = "a b c d e f g h"  # 8 shared middle words
    df = spark.createDataFrame(
        [(0, f"x {mid} x"), (1, f"y {mid} y")], "doc_id long, text string"
    )
    hs = {r.id: list(r.hs) for r in hashed_word_ngrams_df(df, n=10).collect()}
    assert len(hs[0]) == 1 and len(hs[1]) == 1
    assert hs[0][0] != hs[1][0], "periodic xor cancellation is back"


def test_hashed_shingles_jaccard_matches_string_shingles(spark):
    """Hashed-window Jaccard must equal string-shingle Jaccard on a
    collision-free corpus (the equivalence ngram_jaccard relies on)."""
    from auto_archiver_spark.operators.dedup import (
        hashed_word_ngrams_df,
        word_ngrams_expr,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog tomorrow"),
        (2, "completely different words in this one here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = {
        r.id: set(r.hs) for r in hashed_word_ngrams_df(df, n=3).collect()
    }
    strings = {
        r.doc_id: set(r.sh)
        for r in df.select(
            "doc_id", word_ngrams_expr(F.col("text"), 3).alias("sh")
        ).collect()
    }

    def jac(d, a, b):
        return len(d[a] & d[b]) / len(d[a] | d[b])

    for a, b in [(0, 1), (0, 2), (1, 2)]:
        assert jac(hashed, a, b) == pytest.approx(jac(strings, a, b))


def test_c4_clean_kernel(spark):
    """C4 line rules: terminal punctuation, >=3 words, marker phrases;
    counts ignore empty lines; output lines are trimmed."""
    from pyspark.sql import functions as F

    from auto_archiver_spark.functions.text import c4_clean_cols

    text = "\n".join([
        "  A proper sentence right here.  ",
        "no punctuation here",
        "Too short.",
        "We use cookies on this site.",   # marker
        "",
        'He said "stop"',                 # ends in quote -> kept
    ])
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(*c4_clean_cols(F.col("t"))).collect()[0]
    assert row.clean_text == 'A proper sentence right here.\nHe said "stop"'
    assert row.kept_lines == 2 and row.dropped_lines == 3


def test_gopher_repetition_kernel(spark):
    """Exact repetition counts + lexicographic bigram tie-break."""
    from pyspark.sql import functions as F

    from auto_archiver_spark.functions.text import gopher_repetition_cols

    text = "dup line\ndup line\nother text\nzz aa zz aa"
    df = spark.createDataFrame([(text,), ("one\n\n",), ("",)], "t string")
    rows = df.select("t", *gopher_repetition_cols(F.col("t"))).collect()
    r = next(x for x in rows if x.t == text)
    assert r.total_lines == 4 and r.distinct_lines == 3
    assert r.dup_line_chars == 16  # 'dup line' twice
    # bigrams: 'dup line' x2? words are split across ALL whitespace: the
    # text has 'line dup' too; 'aa zz','zz aa' counts: zz aa=2, aa zz=1,
    # dup line=2, line dup=1, line other=1, other text=1, text zz=1
    # -> max count 2, tie {dup line, zz aa} -> 'dup line'
    assert r.top_bigram == "dup line" and r.top_bigram_count == 2
    single = next(x for x in rows if x.t == "one\n\n")
    assert single.total_lines == 1 and single.top_bigram is None
    assert single.top_bigram_count == 0


def test_gopher_bigram_long_doc(spark):
    """ADVICE r5: the top-bigram pass must not be quadratic in word count —
    a 20k-word document must finish promptly (sorted run-length fold is
    O(W log W)) and the count must be EXACT over the full word stream,
    with the lexicographic tie-break preserved."""
    import time

    from pyspark.sql import functions as F

    from auto_archiver_spark.functions.text import gopher_repetition_cols

    # 20k unique filler words, with 'zz top' planted 40 times at the end
    # and 'aa bb' 40 times at the front (tie -> lexicographically smaller)
    head = "aa bb " * 40
    mid = " ".join(f"w{i}" for i in range(20_000))
    text = head + mid + " zz top" * 40
    df = spark.createDataFrame([(text,)], "t string")
    t0 = time.monotonic()
    r = df.select(*gopher_repetition_cols(F.col("t"))).collect()[0]
    elapsed = time.monotonic() - t0
    assert r.top_bigram == "aa bb" and r.top_bigram_count == 40
    # the old quadratic pass took minutes at 1k words; 20k words must be
    # sub-10s wall including task dispatch
    assert elapsed < 10, f"bigram pass too slow: {elapsed:.1f}s"


def test_arrow_shingle_twin_bit_identical(spark):
    """r8: the Arrow-vectorized sketch stage (_shingle_minhash_arrow) must
    reproduce the JVM expression twin (_shingle_hash_df + the 16 affine
    permutation minima) BIT-FOR-BIT — including Java-regex split semantics
    (ASCII \\s, leading/trailing empties), the trim-space rule, md5-int60,
    and the int64 modular arithmetic. Exercises degenerate (<3 words),
    empty, tab/newline-separated and repeated-word docs."""
    from pyspark.sql import functions as F

    from auto_archiver_spark import queries as Q

    rows = [
        (0, "order agg batch key spark part hash scan"),
        (1, "one two"),                       # degenerate: 2 words
        (2, ""),                              # degenerate: empty text
        (3, "  padded   with   spaces  "),    # trim + runs of spaces
        (4, "tab\tseparated\twords here ok"),  # java \s includes \t
        (5, "line\nbreaks\nand\x0bvtab and more words"),
        (6, "dup dup dup dup dup dup"),       # word-cache path
        (7, "x " * 200 + "y"),                # long doc
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    jvm_hs = {r["id"]: list(r["hs"]) for r in Q._shingle_hash_df(d, "id").collect()}

    def perm(a, b):
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(Q._MH_P)

    jvm_mins = {
        r["id"]: [r[f"m{i}"] for i in range(16)]
        for r in Q._shingle_hash_df(d, "id")
        .select(
            "id",
            *[
                F.array_min(F.transform(F.col("hs"), perm(a, b))).alias(f"m{i}")
                for i, (a, b) in enumerate(Q._MH_PERMS)
            ],
        )
        .collect()
    }
    arrow = {
        r["id"]: (list(r["hs"]), list(r["mins"]))
        for r in Q._shingle_minhash_arrow(d, "id").collect()
    }
    assert set(arrow) == set(jvm_hs)
    for k in jvm_hs:
        assert arrow[k][0] == jvm_hs[k], f"hs mismatch doc {k}"
        assert arrow[k][1] == jvm_mins[k], f"mins mismatch doc {k}"
