"""Dedup operator tests on planted synthetic corpora: exact groups found,
near-dups surfaced by MinHash-LSH and SimHash, Jaccard values exact."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit -> near duplicate
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution and shuffles"
)


def _docs(spark):
    rows = [
        (0, BASE, "a"),
        (1, "  THE  quick brown fox jumps over the lazy dog while the cat watches "
            "from the warm windowsill and the birds sing in the garden outside ", "a"),
        (2, NEAR, "a"),
        (3, FAR, "a"),
        (4, FAR, "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_exact_dedup_groups_normalized_copies(spark):
    out = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(_docs(spark)).collect()}
    # doc 1 is doc 0 after case/whitespace normalization
    assert out[0] == 2
    assert out[2] == 1
    assert out[3] == 2  # docs 3 and 4 identical text


def test_minhash_lsh_finds_planted_near_dup(spark):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_dup_candidates(
            _docs(spark), num_hashes=32, bands=16
        ).collect()
    }
    assert (0, 1) in cand  # exact dup always a candidate
    assert (0, 2) in cand  # one-token edit shares most shingles
    assert (3, 4) in cand
    assert (0, 3) not in cand and (1, 3) not in cand  # unrelated content


def test_simhash_near_dup(spark):
    cand = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_candidates(_docs(spark), max_hamming=6).collect()
    }
    assert cand[(0, 1)] == 0  # normalized-identical -> identical signature
    assert (0, 2) in cand and cand[(0, 2)] <= 6
    assert (0, 3) not in cand


def test_simhash_blocking_finds_planted_hamming5_pair(spark):
    """Regression for the pigeonhole contract: a pair at Hamming 5 whose
    differing bits are spread across ALL FOUR of the old fixed 16-bit
    chunks (bits 0, 1, 16, 32, 48) was silently dropped by the previous
    4-chunk blocking whenever max_hamming > 3. The generalized blocking
    (k = max_hamming + 1 chunks) must find it."""
    sig_b = (1 << 0) | (1 << 1) | (1 << 16) | (1 << 32) | (1 << 48)
    sigs = spark.createDataFrame([(0, 0), (1, sig_b)], "doc_id int, sh long")
    for d in (5, 6):
        out = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_candidates_from_signatures(
                sigs, max_hamming=d
            ).collect()
        }
        assert out == {(0, 1): 5}


def test_simhash_blocking_guarantee_random_signatures(spark):
    """Brute-force cross-check: every pair within max_hamming must be
    emitted, none beyond it, for random signatures and a non-default
    chunk count (k > d + 1 exercises the combination keys)."""
    import itertools
    import random

    rng = random.Random(42)
    sigs = [(i, rng.getrandbits(63)) for i in range(40)]
    # plant a few close pairs at varied distances
    for i, d in ((0, 1), (1, 4), (2, 6), (3, 7)):
        s = sigs[i][1]
        for b in rng.sample(range(64), d):
            s ^= 1 << b
        sigs.append((100 + i, s & ((1 << 63) - 1)))
    expected = {
        (a_id, b_id): bin(a ^ b).count("1")
        for (a_id, a), (b_id, b) in itertools.combinations(sigs, 2)
        if bin(a ^ b).count("1") <= 6
    }
    df = spark.createDataFrame(sigs, "doc_id int, sh long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_candidates_from_signatures(
            df, max_hamming=6, n_chunks=10
        ).collect()
    }
    assert got == expected


def test_near_dup_clusters_transitive_closure(spark):
    """A~B and B~C must land A, B, C in ONE cluster labeled min-id, even
    though (A, C) was never a pair; isolated nodes stay singletons; a
    long chain (diameter > 1) exercises multi-round propagation."""
    ids = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    pairs = spark.createDataFrame(
        # component {0,1,2} via chain; component {5,6}; chain 7-8-9
        [(0, 1), (1, 2), (5, 6), (8, 7), (9, 8)],
        ["doc_a", "doc_b"],
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(ids, pairs).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7}


def test_simhash_rejects_insufficient_chunks():
    import pytest

    with pytest.raises(ValueError, match="must exceed max_hamming"):
        dedup.simhash_candidates_from_signatures(None, max_hamming=6, n_chunks=4)


def test_jaccard_exact_values(spark):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            _docs(spark), block_col="source", shingle_n=1, threshold=0.0
        ).collect()
    }
    assert out[(0, 1)] == 1.0
    # distinct-token sets differ by one word each way: |A∩B| = n-1, |A∪B| = n+1
    a = set(BASE.split())
    b = set(NEAR.split())
    assert abs(out[(0, 2)] - len(a & b) / len(a | b)) < 1e-12
    # blocked: (3,4) are in different sources -> no pair emitted
    assert (3, 4) not in out


def test_jaccard_prefiltered_matches_exact_for_near_dups(spark):
    """The LSH-prefiltered Jaccard must (a) find the clearly-near-dup
    pairs, (b) report the same exact Jaccard values as the unfiltered
    operator, (c) never emit pairs below the threshold."""
    docs = _docs(spark)
    pre = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs_prefiltered(
            docs, shingle_n=1, threshold=0.3, num_hashes=32, bands=16
        ).collect()
    }
    # blocked-exact twin over one global block for ground truth
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            docs.withColumn("source", F.lit("all")),
            block_col="source", shingle_n=1, threshold=0.3,
        ).collect()
    }
    assert (0, 1) in pre and (0, 2) in pre and (3, 4) in pre
    for k, v in pre.items():
        assert k in exact and v == exact[k]
        assert v >= 0.3


def _rand_names(n, seed=7):
    """Diverse random names with a planted ~10% near-duplicate rate."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(10))
        rows.append((2 * i, s))
        if i % 10 == 0:  # plant a 1-substitution near-dup
            t = list(s)
            t[rng.randrange(10)] = rng.choice("abcdefghij")
            rows.append((2 * i + 1, "".join(t)))
    return rows


def test_edit_distance_pairs_match_bruteforce(spark):
    """Symmetric-delete blocking is recall-lossless: pairs must equal the
    quadratic cross-join ground truth exactly, including insert/delete
    edits (length-changing)."""
    rows = _rand_names(25, seed=3)
    # add length-changing edits of row 0's string
    base = rows[0][1]
    rows += [
        (1001, base[1:]),            # delete first char
        (1002, base + "z"),          # append
        (1003, base[:4] + base[5:]), # delete middle char
        (1004, base[:5] + "qq" + base[5:]),  # double insert
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dedup.edit_distance_pairs(df, "id", "name", max_dist=2).collect()
    }
    a = df.select(F.col("id").alias("ia"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    want = {
        (r["ia"], r["ib"]): r["d"]
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("d", F.levenshtein("na", "nb"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == want and len(got) >= 5


def test_edit_distance_candidates_subquadratic(spark):
    """Candidate count must scale ~linearly on a 10x corpus (a quadratic
    block would grow ~100x)."""
    small = spark.createDataFrame(_rand_names(150), ["id", "name"])
    big = spark.createDataFrame(_rand_names(1500), ["id", "name"])
    c_small = dedup.edit_distance_candidates(small, "id", "name").count()
    c_big = dedup.edit_distance_candidates(big, "id", "name").count()
    assert c_small >= 10  # planted near-dups are found at all
    assert c_big <= 25 * max(c_small, 1)


def test_simhash_signature_deterministic(spark):
    sigs1 = {r["doc_id"]: r["sh"] for r in dedup.simhash_signatures(_docs(spark)).collect()}
    sigs2 = {r["doc_id"]: r["sh"] for r in dedup.simhash_signatures(_docs(spark)).collect()}
    assert sigs1 == sigs2
    assert sigs1[3] == sigs1[4]


def test_near_dup_clusters_raises_on_non_convergence(spark):
    """A chain whose diameter exceeds max_iters must raise, not silently
    return labels that split the component (ADVICE r03)."""
    import pytest

    n = 8
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="still changing"):
        dedup.near_dup_clusters(ids, chain, max_iters=2)


def test_star_contraction_chain_graph_log_rounds(spark):
    """large-star/small-star contraction labels a 64-node path graph
    correctly within O(log n) rounds — min-label propagation would need
    ~diameter (63) rounds; 12 is far below that and ~2*log2(64)."""
    import pytest

    n = 64
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters_star(ids, chain, max_iters=12).collect()
    }
    assert out == {i: 0 for i in range(n)}
    with pytest.raises(RuntimeError, match="not converged"):
        dedup.near_dup_clusters_star(ids, chain, max_iters=1).collect()


def test_star_contraction_matches_label_propagation(spark):
    """Both cluster algorithms agree on a mixed graph (chains, isolated
    nodes, merged components)."""
    ids = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 7), (9, 8), (2, 9), (10, 11)],
        ["doc_a", "doc_b"],
    )
    a = {r["doc_id"]: r["cluster_id"] for r in dedup.near_dup_clusters(ids, pairs).collect()}
    b = {r["doc_id"]: r["cluster_id"] for r in dedup.near_dup_clusters_star(ids, pairs).collect()}
    assert a == b


def test_simhash_rejects_out_of_range_hamming_and_clamps_first(spark):
    import pytest

    with pytest.raises(ValueError, match="out of range"):
        dedup.simhash_candidates_from_signatures(None, max_hamming=64)
    with pytest.raises(ValueError, match="out of range"):
        dedup.simhash_candidates_from_signatures(None, max_hamming=-1)
    # n_chunks > 64 is clamped BEFORE validation (ADVICE r03: the old
    # post-validation clamp could yield k <= d and an empty combo key);
    # the clamped k=64, d=3 would replicate each doc C(64,61)=41,664x,
    # so the replication guard must refuse it loudly
    with pytest.raises(ValueError, match="replicates each doc"):
        dedup.simhash_candidates_from_signatures(None, max_hamming=3, n_chunks=100)
    # a sane oversized k still works and finds a planted d=3 pair
    sig_b = (1 << 0) | (1 << 21) | (1 << 42)
    sigs = spark.createDataFrame([(0, 0), (1, sig_b)], "doc_id int, sh long")
    got = dedup.simhash_candidates_from_signatures(
        sigs, max_hamming=3, n_chunks=8
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [(0, 1, 3)]


def test_prefix_slice_edit_distance_is_lossless_on_shared_prefix(spark):
    """prefix_block_len must return EXACTLY the full-variant results on a
    shared-prefix corpus (lev(Px, Py) = lev(x, y)) — the recall claim
    behind the fuzzy query's discriminative-slice cut."""
    rows = [(i, f"Customer#{i % 300:09d}") for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "name"])
    full = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.edit_distance_pairs(df, "id", "name").collect()
    }
    sliced = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.edit_distance_pairs(
            df, "id", "name", prefix_block_len=9
        ).collect()
    }
    assert sliced == full and len(full) > 600  # dup ids + near digit runs


def test_minhash_verified_agrees_with_fast_path(spark):
    """The md5-family verified MinHash and the xxhash64 fast path use
    independent hash families over the same shingles — on the planted
    corpus both must surface the same near-dup pairs."""
    fast = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_dup_candidates(
            _docs(spark), num_hashes=32, bands=16
        ).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_near_dup_verified(
            _docs(spark), num_hashes=16, bands=8, threshold=0.3
        ).collect()
    }
    assert (0, 1) in verified and verified[(0, 1)] == 1.0
    assert (0, 2) in verified and (3, 4) in verified
    assert set(verified) <= fast | {(0, 1), (0, 2), (1, 2), (3, 4)}


def test_simhash_verified_md5_family(spark):
    """md5-family SimHash: planted near-dups surface, unrelated docs do
    not, and the two hash families (xxhash64 / md5) agree on the
    normalized-identical pair (hamming 0 regardless of family)."""
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_verified(_docs(spark), max_hamming=6).collect()
    }
    assert got[(0, 1)] == 0   # normalized-identical -> identical signature
    assert (0, 2) in got and got[(0, 2)] <= 6
    assert (0, 3) not in got and (0, 4) not in got


def test_near_dup_clusters_star_fallback_on_budget(spark):
    """on_budget_exhausted='star': the same chain that defeats min-label
    propagation at max_iters=2 converges via the contraction fallback to
    the correct single component (with a warning, not an exception)."""
    import warnings

    n = 8
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.near_dup_clusters(
                ids, chain, max_iters=2, on_budget_exhausted="star"
            ).collect()
        }
    assert any("switching" in str(x.message) for x in w)
    assert got == {i: 0 for i in range(n)}


def test_edit_distance_collapsed_equals_plain(spark):
    """The dist-0-collapsed path must be row-identical to the plain path
    on a duplicate-heavy corpus: duplicates of _rand_names plus planted
    length-changing edits, with and without a block column."""
    rows = _rand_names(20, seed=7)
    base = rows[0][1]
    rows += [(1001, base[1:]), (1002, base + "z")]
    # duplicate every string under fresh ids (x3 for one hot string)
    dup_rows = [(i, s) for i, s in rows]
    dup_rows += [(10_000 + i, s) for i, s in rows]
    dup_rows += [(20_000, base), (20_001, base)]
    df = spark.createDataFrame(dup_rows, ["id", "name"]).withColumn(
        "blk", (F.col("id") % 2 == 0).cast("int") * 0  # single block
    )
    for blocks in ((), ("blk",)):
        plain = {
            (r["id_a"], r["id_b"], r["s_a"], r["s_b"], r["dist"])
            for r in dedup.edit_distance_pairs(
                df, "id", "name", block_cols=blocks, max_dist=2
            ).collect()
        }
        collapsed = [
            (r["id_a"], r["id_b"], r["s_a"], r["s_b"], r["dist"])
            for r in dedup.edit_distance_pairs_collapsed(
                df, "id", "name", block_cols=blocks, max_dist=2
            ).collect()
        ]
        assert len(collapsed) == len(set(collapsed))  # no dup emissions
        assert set(collapsed) == plain
        assert any(d == 0 for *_, d in collapsed)  # dist-0 pairs present


def test_edit_distance_collapsed_null_strings_never_pair(spark):
    """levenshtein(NULL, NULL) is NULL in the plain path, so NULL-string
    rows pair with nothing; the collapsed path's group expansion must not
    resurrect them."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "abc"), (4, "abc")], ["id", "name"]
    )
    got = dedup.edit_distance_pairs_collapsed(df, "id", "name").collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(3, 4)}
    plain = dedup.edit_distance_pairs(df, "id", "name").collect()
    assert {(r["id_a"], r["id_b"]) for r in plain} == {(3, 4)}


def test_edit_distance_collapsed_equals_plain_hypothesis(spark):
    """Randomized corpora (short alphabet -> natural near-dups and exact
    dups) through both paths: row-set equality must hold for every draw.
    Fixed LCG corpus generation keeps the suite deterministic."""
    seed = 0xC0FFEE
    for trial in range(6):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        rng_vals = []
        s = seed
        for _ in range(400):
            s = (s * 48271) % 0x7FFFFFFF
            rng_vals.append(s)
        rows = []
        for i in range(60):
            ln = rng_vals[i] % 5 + 3
            base = "".join("ab"[(rng_vals[i * 3 + j] >> 2) % 2] for j in range(ln))
            rows.append((i, base))
            if rng_vals[i] % 3 == 0:  # exact duplicate under a new id
                rows.append((1000 + i, base))
        df = spark.createDataFrame(rows, ["id", "name"])
        plain = {
            (r["id_a"], r["id_b"], r["s_a"], r["s_b"], r["dist"])
            for r in dedup.edit_distance_pairs(df, "id", "name", max_dist=1).collect()
        }
        coll = [
            (r["id_a"], r["id_b"], r["s_a"], r["s_b"], r["dist"])
            for r in dedup.edit_distance_pairs_collapsed(
                df, "id", "name", max_dist=1
            ).collect()
        ]
        assert len(coll) == len(set(coll)), f"trial {trial}: duplicate emissions"
        assert set(coll) == plain, f"trial {trial}"
        assert plain, f"trial {trial}: vacuous draw"


def test_incremental_dedup_matches_bootstrap(spark):
    """Incremental semantics: survivors dedupe within-batch (min id) and
    against the index; appending the returned delta to the index gives
    exactly the digest set a full exact_dedup over corpus+batch would."""
    corpus = spark.createDataFrame(
        [(0, "seen text one"), (5, "seen text two")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (11, "SEEN   text one"),   # dup of corpus after normalization
            (12, "fresh text"),
            (13, "fresh text"),        # within-batch dup of 12
            (14, "another fresh"),
        ],
        ["doc_id", "text"],
    )
    index = dedup.exact_dedup(corpus).select("h")
    out = dedup.incremental_dedup(batch, index)
    got = {(r["doc_id"], r["n_in_batch"]) for r in out.collect()}
    assert got == {(12, 2), (14, 1)}
    # closing the loop: index + delta == bootstrap digests over the union
    delta = out.select("h")
    merged = {r["h"] for r in index.union(delta).collect()}
    full = {r["h"] for r in dedup.exact_dedup(corpus.union(batch)).collect()}
    assert merged == full


def test_md5_minhash_family_matches_python_and_is_stable(spark):
    """Regression for the transform-lambda arity bug: a two-parameter
    lambda (even via the `i=i` default trick) binds as transform's
    (element, index) form, silently replacing the seed prefix with the
    index lambda-variable's repr — a wrong AND session-order-dependent
    hash family. The fix pins: (a) band keys equal the true python md5
    family bit-for-bit, (b) two invocations in one session agree."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    runs = []
    for _ in range(2):
        g, b = dedup._md5_shingles_and_bands(docs, "text", "doc_id", 3, 16, 8)
        runs.append(sorted((r["band"], r["bk"]) for r in b.collect()))
    assert runs[0] == runs[1]
    grams = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    sigs = [
        min(hashlib.md5(f"{i}:{x}".encode()).hexdigest() for x in grams)
        for i in range(16)
    ]
    want = sorted(
        (band, hashlib.md5((sigs[2 * band] + sigs[2 * band + 1]).encode()).hexdigest())
        for band in range(8)
    )
    assert runs[0] == want


def test_minhash_incremental_equals_full_rerun(spark):
    """Band keys are per-document, so banding a batch alone and probing
    the stored index finds exactly the full-rerun pairs touching the
    batch — corpus-internal pairs excluded."""
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),                             # corpus
        (5, "totally unrelated words here ok"),  # corpus
        (10, base + " tail"),                  # corpus near-dup of 0
        (1, base + " extra"),                  # batch near-dup of 0/10
        (2, "nothing in common with others"),  # batch
        (3, base + " extra"),                  # batch dup of 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)

    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_near_dup_verified(docs).collect()
    }
    touching = {
        (a, b, j) for a, b, j in full if not (a % 5 == 0 and b % 5 == 0)
    }
    idx, store = dedup.minhash_index_verified(corpus)
    inc = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_incremental_verified(batch, idx, store).collect()
    }
    assert inc == touching
    assert len(inc) >= 3  # 1-3 dup pair plus cross pairs to 0/10
    assert any(a % 5 == 0 or b % 5 == 0 for a, b, _ in inc)  # cross pairs exist


def test_simhash_md5_signatures_match_template_form(spark):
    """r11: the md5-family signature moved from the interpreted HOF
    balance/pack templates to explode + 64 conditional-sum aggregates;
    values must be bit-identical, including the empty-token (sh=0) and
    NULL-text (sh=NULL) contracts."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here"),
            (4, "   "),
            (5, None),
            (6, "one"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["sh"] for r in dedup.simhash_signatures_md5(docs).collect()}
    hashes = F.expr(
        "transform(filter(split(regexp_replace(lower(trim(text)),"
        " '\\\\s+', ' '), ' '), x -> x != ''),"
        " t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    )
    want = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", hashes.alias("hs"))
        .select(
            "doc_id",
            F.expr(dedup._SIMHASH_BALANCE_EXPR.format(hs="hs")).alias("bal"),
        )
        .select(
            "doc_id", F.expr(dedup._SIMHASH_PACK_EXPR.format(bal="bal")).alias("sh")
        )
        .collect()
    }
    assert got == want
    assert got[4] == 0 and got[5] is None and got[1] != got[3]
