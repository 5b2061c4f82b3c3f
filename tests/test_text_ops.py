"""Text analysis / dedup operators: oracles via duckdb + brute force."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


class TestAnalysis:
    def test_token_count_matches_duckdb(self, docs_ds, sf_dir):
        from osmptparser_ray.text.analysis import add_token_count

        mine = add_token_count(docs_ds).select_columns(["doc_id", "n_tokens"]).to_pandas()
        oracle = duckdb.sql(
            f"SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens "
            f"FROM '{sf_dir}/documents.parquet'"
        ).df()
        m = mine.sort_values("doc_id").reset_index(drop=True)
        o = oracle.sort_values("doc_id").reset_index(drop=True)
        assert (m["n_tokens"] == o["n_tokens"]).all()

    def test_langid_values(self, docs_ds):
        from osmptparser_ray.text.analysis import add_lang_id

        out = add_lang_id(docs_ds).take_all()
        assert {r["lang_pred"] for r in out} <= {"en", "es", "und"}

    def test_fingerprint_normalization(self, ray_session):
        import hashlib

        import ray.data as rd

        from osmptparser_ray.text.analysis import add_fingerprint

        ds = rd.from_items(
            [
                {"doc_id": 1, "text": "Hello   World"},
                {"doc_id": 2, "text": "  hello world "},
                {"doc_id": 3, "text": "hello\tworld"},
                {"doc_id": 4, "text": "different"},
            ]
        )
        rows = {r["doc_id"]: r["fingerprint"] for r in add_fingerprint(ds).take_all()}
        expect = hashlib.md5(b"hello world").hexdigest()
        assert rows[1] == rows[2] == rows[3] == expect
        assert rows[4] != rows[1]


class TestExactDedup:
    def test_dup_classes(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.dedup import exact_dedup

        ds = rd.from_items(
            [
                {"doc_id": 10, "text": "aaa"},
                {"doc_id": 3, "text": "aaa"},
                {"doc_id": 7, "text": "bbb"},
                {"doc_id": 1, "text": "aaa"},
            ]
        )
        rows = {r["content_md5"]: r for r in exact_dedup(ds).take_all()}
        import hashlib

        a = hashlib.md5(b"aaa").hexdigest()
        b = hashlib.md5(b"bbb").hexdigest()
        assert rows[a]["doc_id"] == 1 and rows[a]["n_dups"] == 3
        assert rows[b]["doc_id"] == 7 and rows[b]["n_dups"] == 1


class TestMinhashLsh:
    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(0)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
        docs = []
        for i in range(30):
            docs.append(
                {"doc_id": i, "text": " ".join(rng.choice(words, size=40).tolist())}
            )
        # two near-dup pairs: tiny edits
        docs.append({"doc_id": 100, "text": docs[0]["text"] + " extra"})
        docs.append({"doc_id": 101, "text": docs[5]["text"].replace("alpha", "alpha", 1)})
        docs.append({"doc_id": 102, "text": docs[5]["text"]})
        return docs

    def _brute_jaccard(self, docs, k=5):
        from osmptparser_ray.text.dedup import _shingles

        sh = {d["doc_id"]: set(_shingles(d["text"], k).tolist()) for d in docs}
        pairs = {}
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sh[a] & sh[b])
                union = len(sh[a] | sh[b])
                pairs[(a, b)] = inter / union if union else 0.0
        return pairs

    def test_lsh_finds_near_dups(self, ray_session, corpus):
        import ray.data as rd

        from osmptparser_ray.text.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            verify_jaccard,
        )

        ds = rd.from_items(corpus)
        sigs = minhash_signatures(ds, num_perm=64, shingle_k=5)
        pairs = lsh_candidate_pairs(sigs, bands=16)
        verified = verify_jaccard(pairs, ds, threshold=0.8)
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified.take_all()}
        brute = self._brute_jaccard(corpus)
        # every high-jaccard pair must be found (these are ≥0.9 — LSH at
        # 16 bands × 4 rows catches them w.h.p. with fixed seeds)
        for (a, b), j in brute.items():
            if j >= 0.9:
                assert (a, b) in got, f"missed near-dup pair {(a, b)} j={j}"
        # and everything reported really is above threshold (exact verify)
        for (a, b), j in got.items():
            assert j == pytest.approx(brute[(a, b)])
            assert j >= 0.8


    def test_verify_plan_parity_join_vs_broadcast(self, ray_session, corpus):
        """The distributed verification (two pairs⨝docs hash joins — the
        path that still works when the corpus exceeds a worker's heap and
        the id→text broadcast becomes impossible) must return exactly the
        broadcast plan's pairs and jaccard values."""
        import ray.data as rd

        from osmptparser_ray.text.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            verify_jaccard,
        )

        ds = rd.from_items(corpus)
        sigs = minhash_signatures(ds, num_perm=64, shingle_k=5)
        pairs = lsh_candidate_pairs(sigs, bands=16).materialize()
        results = {
            plan: {
                (r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in verify_jaccard(pairs, ds, threshold=0.8, plan=plan).take_all()
            }
            for plan in ("join", "pruned", "broadcast")
        }
        a = results["join"]
        assert len(a) > 0
        for plan in ("pruned", "broadcast"):
            b = results[plan]
            assert set(a) == set(b), plan
            for k in a:
                assert a[k] == pytest.approx(b[k]), plan


class TestSimhash:
    def test_near_pairs_vs_brute(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.dedup import simhash_near_pairs, simhash_signatures

        rng = np.random.default_rng(1)
        words = ["red", "green", "blue", "cyan", "teal", "pink"]
        docs = [
            {"doc_id": i, "text": " ".join(rng.choice(words, size=30).tolist())}
            for i in range(20)
        ]
        docs.append({"doc_id": 50, "text": docs[0]["text"]})  # identical → hamming 0
        ds = rd.from_items(docs)
        sigs = simhash_signatures(ds).materialize()
        sig_map = {r["doc_id"]: r["simhash"] for r in sigs.take_all()}
        pairs = simhash_near_pairs(sigs, max_hamming=3).take_all()
        got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
        # brute force oracle
        ids = sorted(sig_map)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = bin(int(sig_map[a]) ^ int(sig_map[b])).count("1")
                if ham <= 3:
                    assert (a, b) in got and got[(a, b)] == ham
                else:
                    assert (a, b) not in got
        assert got[(0, 50)] == 0


class TestDuplicateGroups:
    def test_chain_components(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.dedup import duplicate_groups

        # edges: 1-2, 2-3 (chain), 10-11, 20-21, 21-22-23 via (21,22),(22,23)
        pairs = rd.from_items(
            [
                {"doc_a": 1, "doc_b": 2},
                {"doc_a": 2, "doc_b": 3},
                {"doc_a": 10, "doc_b": 11},
                {"doc_a": 20, "doc_b": 21},
                {"doc_a": 21, "doc_b": 22},
                {"doc_a": 22, "doc_b": 23},
            ]
        )
        got = {r["doc_id"]: r["rep_id"] for r in duplicate_groups(pairs).take_all()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}

    def test_broadcast_shuffle_parity(self, ray_session):
        """Both physical plans (driver-numpy pointer jumping vs per-round
        join+groupby-min) produce identical components — incl. a long
        chain (deep diameter) and singleton-free star shapes."""
        import ray.data as rd

        from osmptparser_ray.text.dedup import duplicate_groups

        edges = (
            [{"doc_a": i, "doc_b": i + 1} for i in range(100, 140)]  # long chain
            + [{"doc_a": 7, "doc_b": x} for x in (900, 901, 902)]  # star
            + [{"doc_a": 55, "doc_b": 54}]  # reversed order pair
        )
        pairs = rd.from_items(edges)
        a = {r["doc_id"]: r["rep_id"]
             for r in duplicate_groups(pairs, plan="broadcast").take_all()}
        b = {r["doc_id"]: r["rep_id"]
             for r in duplicate_groups(pairs, plan="shuffle", max_rounds=64).take_all()}
        assert a == b
        assert a[139] == 100 and a[902] == 7 and a[54] == 54 and a[55] == 54


class TestWinnowing:
    def test_shared_substring_guarantee(self, ray_session):
        """Winnowing guarantee: documents sharing a substring of length
        ≥ window+k-1 share at least one fingerprint."""
        import ray.data as rd

        from osmptparser_ray.text.analysis import add_rolling_fingerprints

        shared = "the quick brown fox jumps over everything here"
        docs = [
            {"doc_id": 1, "text": "AAAA " + shared + " BBBB"},
            {"doc_id": 2, "text": "cccc dddd " + shared + " eeee"},
            {"doc_id": 3, "text": "completely unrelated content zzz qqq www"},
        ]
        out = add_rolling_fingerprints(rd.from_items(docs), k=5, window=8).take_all()
        fps = {r["doc_id"]: set(r["fingerprints"]) for r in out}
        assert fps[1] & fps[2], "shared substring must yield shared fingerprints"
        assert len(fps[1] & fps[3]) <= len(fps[1]) // 3  # mostly disjoint

    def test_deterministic(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.analysis import add_rolling_fingerprints

        docs = [{"doc_id": 1, "text": "some stable text for hashing"}]
        a = add_rolling_fingerprints(rd.from_items(docs)).take_all()[0]["fingerprints"]
        b = add_rolling_fingerprints(rd.from_items(docs)).take_all()[0]["fingerprints"]
        assert a == b and len(a) > 0


class TestQualityFilter:
    def test_thresholds(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.analysis import quality_filter

        docs = [
            {"doc_id": 1, "text": "the quick brown fox and the lazy dog again " * 3},
            {"doc_id": 2, "text": "short"},
            {"doc_id": 3, "text": "!!! ??? ... " * 20},  # punct-dense, no tokens... 
            {"doc_id": 4, "text": "word " * 50},  # no stopwords
        ]
        out = quality_filter(
            rd.from_items(docs), min_tokens=10, max_punct_ratio=0.1, min_stop_hits=1
        ).take_all()
        assert [r["doc_id"] for r in out] == [1]


class TestTokenFrequencies:
    def test_matches_counter_reference(self, ray_session):
        import re
        from collections import Counter

        import pandas as pd
        import ray.data as rd

        from osmptparser_ray.text.analysis import TOKEN_RE, token_frequencies

        docs = [
            "the cat sat on the mat",
            "The CAT ate; the dog_1 slept!",
            "mat mat mat",
            "",
            "punct-only!!! ...",
        ]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3)
        got = [(r["token"], r["cnt"]) for r in token_frequencies(ds, top_n=4).take_all()]
        c = Counter(re.compile(TOKEN_RE).findall(" ".join(docs).lower()))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        assert got == want

    def test_tie_at_limit_boundary_deterministic(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from osmptparser_ray.text.analysis import token_frequencies

        # aa/bb/cc/dd all cnt=2: top_n=2 must take aa, bb (token asc)
        ds = rd.from_pandas(pd.DataFrame({"text": ["aa bb cc dd", "dd cc bb aa"]}))
        got = [(r["token"], r["cnt"]) for r in token_frequencies(ds, top_n=2).take_all()]
        assert got == [("aa", 2), ("bb", 2)]


class TestWordDiversity:
    def test_matches_duckdb(self, docs_ds, sf_dir):
        from osmptparser_ray.text import add_word_diversity

        mine = (
            add_word_diversity(docs_ds)
            .select_columns(["doc_id", "n_words", "n_distinct", "distinct_ratio"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.sql(
                "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, "
                "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct, "
                "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / "
                "greatest(len(string_split(text, ' ')), 1) AS distinct_ratio "
                f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
            )
            .df()
            .reset_index(drop=True)
        )
        assert (mine["n_words"] == oracle["n_words"]).all()
        assert (mine["n_distinct"] == oracle["n_distinct"]).all()
        assert np.array_equal(mine["distinct_ratio"], oracle["distinct_ratio"])

    def test_edge_cases(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text import add_word_diversity

        ds = rd.from_items(
            [
                {"doc_id": 1, "text": "a a a a"},
                {"doc_id": 2, "text": "a b c d"},
                {"doc_id": 3, "text": ""},
                {"doc_id": 4, "text": "x  y"},  # double space → empty word
            ]
        )
        rows = {r["doc_id"]: r for r in add_word_diversity(ds).take_all()}
        assert rows[1]["n_words"] == 4 and rows[1]["n_distinct"] == 1
        assert rows[2]["n_distinct"] == 4 and rows[2]["distinct_ratio"] == 1.0
        # split('') == [''] — one (empty) word, matching DuckDB string_split
        assert rows[3]["n_words"] == 1 and rows[3]["n_distinct"] == 1
        assert rows[4]["n_words"] == 3 and rows[4]["n_distinct"] == 3


class TestScrubPattern:
    def test_matches_duckdb(self, docs_ds, sf_dir):
        from osmptparser_ray.text import scrub_pattern

        mine = (
            scrub_pattern(docs_ds)
            .select_columns(["doc_id", "n_scrubbed", "scrubbed"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.sql(
                "SELECT doc_id, "
                "CAST(len(regexp_extract_all(text, '\\b(key|order)\\b')) AS BIGINT) AS n_scrubbed, "
                "regexp_replace(text, '\\b(key|order)\\b', '<SCRUBBED>', 'g') AS scrubbed "
                f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
            )
            .df()
            .reset_index(drop=True)
        )
        assert (mine["n_scrubbed"] == oracle["n_scrubbed"]).all()
        assert (mine["scrubbed"] == oracle["scrubbed"]).all()

    def test_word_boundaries(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text import scrub_pattern

        ds = rd.from_items(
            [{"doc_id": 1, "text": "key keyed order disorder key"}]
        )
        row = scrub_pattern(ds).take_all()[0]
        # only standalone words hit: 'keyed'/'disorder' untouched
        assert row["n_scrubbed"] == 3
        assert row["scrubbed"] == "<SCRUBBED> keyed <SCRUBBED> disorder <SCRUBBED>"


class TestPackSequences:
    def test_matches_window_oracle(self, ray_session, sf_dir):
        import ray.data as rd

        from osmptparser_ray.text import pack_sequences
        from osmptparser_ray.text.analysis import add_token_count

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        mine = (
            pack_sequences(add_token_count(ds).drop_columns(["text"]), budget=256)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.sql(
                "SELECT doc_id, CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id, "
                "CAST((cum - n_tokens) % 256 AS BIGINT) AS pack_off FROM ("
                "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens, "
                "SUM(CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)) "
                "OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum "
                f"FROM '{sf_dir}/documents.parquet') ORDER BY doc_id"
            )
            .df()
            .reset_index(drop=True)
        )
        assert (mine["pack_id"].values == oracle["pack_id"].values).all()
        assert (mine["pack_off"].values == oracle["pack_off"].values).all()

    def test_many_blocks_boundary_chain(self, ray_session):
        """Pack ids must be globally consistent across block boundaries."""
        import ray.data as rd

        from osmptparser_ray.text import pack_sequences

        n = 1000
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "n_tokens": pa.array([7] * n, pa.int64()),
                }
            )
        ).repartition(13)
        out = (
            pack_sequences(ds, budget=100)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        starts = np.arange(n, dtype=np.int64) * 7
        assert (out["pack_id"].values == starts // 100).all()
        assert (out["pack_off"].values == starts % 100).all()

    def test_empty_and_invalid(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text import pack_sequences

        empty = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        )
        assert pack_sequences(empty).count() == 0
        with pytest.raises(ValueError):
            pack_sequences(empty, budget=0)


class TestWordDiversityNulls:
    def test_null_text_scores_zero(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text import add_word_diversity

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b", None], pa.string()),
                }
            )
        )
        rows = {r["doc_id"]: r for r in add_word_diversity(ds).take_all()}
        assert rows[1]["n_words"] == 2
        assert rows[2]["n_words"] == 0 and rows[2]["n_distinct"] == 0


class TestTfidf:
    """TF-IDF top terms vs an independent scalar/numpy reference."""

    def _docs(self, texts, ids=None, blocks=3):
        import ray.data as rd
        import pyarrow as pa

        ids = ids if ids is not None else list(range(len(texts)))
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(blocks)

    def _reference(self, texts, k, idf):
        """Scalar reference: regex findall per doc, dict counting."""
        import re
        from collections import Counter

        import numpy as np

        pat = re.compile(r"[a-z0-9_]+")
        tfs = [Counter(pat.findall((t or "").lower())) for t in texts]
        df = Counter()
        for c in tfs:
            df.update(c.keys())
        n = len(texts)
        out = {}
        for i, c in enumerate(tfs):
            scored = []
            for tok, tf in c.items():
                s = (
                    float(tf * n) / df[tok]
                    if idf == "ratio"
                    else tf * np.log(n / float(df[tok]))
                )
                scored.append((-s, tok, tf, df[tok], s))
            scored.sort()
            out[i] = [
                (r + 1, tok, tf, dfv, s)
                for r, (_, tok, tf, dfv, s) in enumerate(scored[:k])
            ]
        return out

    def test_matches_reference_ratio(self, ray_session):
        from osmptparser_ray.text.analysis import tfidf_top_terms

        texts = [
            "the cat sat on the mat",
            "the dog ate the cat food",
            "quantum flux capacitor overload",
            "cat cat cat dog",
            "",
            "the the the",
        ]
        got = {}
        for r in tfidf_top_terms(self._docs(texts), k=3).take_all():
            got.setdefault(r["doc_id"], []).append(
                (r["rank"], r["token"], r["tf"], r["df"], r["score"])
            )
        ref = self._reference(texts, 3, "ratio")
        for i in range(len(texts)):
            assert sorted(got.get(i, [])) == ref[i], f"doc {i}"

    def test_log_variant_matches_numpy(self, ray_session):
        from osmptparser_ray.text.analysis import tfidf_top_terms

        texts = ["alpha beta beta", "alpha gamma", "beta delta delta delta"]
        got = {}
        for r in tfidf_top_terms(self._docs(texts), k=2, idf="log").take_all():
            got.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["score"]))
        ref = self._reference(texts, 2, "log")
        for i in range(len(texts)):
            want = [(rk, tok, s) for rk, tok, _tf, _df, s in ref[i]]
            assert sorted(got.get(i, [])) == sorted(want)

    def test_block_invariance_and_nulls(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import tfidf_top_terms

        texts = ["x y z", None, "x x q", "z q r s", "y"]
        ids = [10, 20, 30, 40, 50]

        def run(blocks):
            ds = rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "text": pa.array(texts, pa.string()),
                    }
                )
            ).repartition(blocks)
            return sorted(
                (r["doc_id"], r["rank"], r["token"], r["tf"], r["df"], r["score"])
                for r in tfidf_top_terms(ds, k=2).take_all()
            )

        assert run(1) == run(5)


class TestNgramFrequencies:
    def test_bigrams_match_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import ngram_frequencies

        texts = [
            "the cat sat the cat",
            "a b",
            "x",
            None,
            "The CAT sat! the cat...",
            "",
        ]
        ds = rd.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(3)
        got = sorted(
            (r["ngram"], r["cnt"]) for r in ngram_frequencies(ds, n=2, top_n=50).take_all()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
        want = sorted(
            con.execute(
                "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS l "
                "FROM documents), pairs AS (SELECT unnest(list_zip(l[1:len(l)-1], "
                "l[2:len(l)])) AS pr FROM toks WHERE len(l) >= 2) "
                "SELECT pr[1] || ' ' || pr[2] AS ngram, CAST(count(*) AS BIGINT) AS cnt "
                "FROM pairs GROUP BY ngram"
            ).fetchall()
        )
        assert got == want

    def test_trigram_and_unigram(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import ngram_frequencies

        ds = rd.from_arrow(
            pa.table({"text": pa.array(["a b c a b c", "b c a"], pa.string())})
        ).repartition(2)
        tri = {r["ngram"]: r["cnt"] for r in ngram_frequencies(ds, n=3).take_all()}
        assert tri == {"a b c": 2, "b c a": 2, "c a b": 1}
        uni = {r["ngram"]: r["cnt"] for r in ngram_frequencies(ds, n=1).take_all()}
        assert uni == {"a": 3, "b": 3, "c": 3}

    def test_no_cross_doc_ngrams(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import ngram_frequencies

        # one doc per block boundary: 'z' then 'w' must NOT form 'z w'
        ds = rd.from_arrow(
            pa.table({"text": pa.array(["z", "w"], pa.string())})
        ).repartition(1)
        assert ngram_frequencies(ds, n=2).count() == 0


class TestNormalizeText:
    def test_forms_and_options(self, ray_session):
        import unicodedata

        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import normalize_text

        texts = ["café", "Å", "ﬁle", None, "  Á  B  "]
        ds = rd.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(2)
        got = [r["text_norm"] for r in normalize_text(ds, "text").take_all()]
        want = [None if t is None else unicodedata.normalize("NFC", t) for t in texts]
        assert sorted(x or "" for x in got) == sorted(x or "" for x in want)
        # NFKC folds the ligature; lower + collapse_ws compose
        nk = normalize_text(ds, "text", form="NFKC", lower=True, collapse_ws=True)
        outs = {r["text_norm"] for r in nk.take_all() if r["text_norm"] is not None}
        assert "file" in outs  # ligature folded by NFKC
        assert "á b" in outs  # lowered, composed, whitespace collapsed

    def test_tfidf_plan_parity_broadcast_vs_shuffle(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from osmptparser_ray.text.analysis import tfidf_top_terms

        texts = ["the cat sat", "dog ate cat food", "cat dog cat", "x y z"]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(2)
        a = {
            (r["doc_id"], r["rank"], r["token"], r["score"])
            for r in tfidf_top_terms(ds, k=2, plan="broadcast").take_all()
        }
        b = {
            (r["doc_id"], r["rank"], r["token"], r["score"])
            for r in tfidf_top_terms(ds, k=2, plan="shuffle").take_all()
        }
        assert a == b


class TestWinnowingBatchFlat:
    def test_differential_vs_scalar_reference(self, ray_session):
        """Batch-flat winnowing == the scalar per-doc reference on random
        docs of every size class (empty, < k, == k, <= window, large),
        across several (k, window) configs and sliced batches."""
        import numpy as np
        import ray.data as rd

        from osmptparser_ray.text.analysis import (
            _winnow_doc,
            add_rolling_fingerprints,
        )

        rng = np.random.default_rng(17)
        alpha = list("abcdefg XYZ.!áé")
        docs = ["", "a", "abcd", "abcde", "hello wor", "x" * 7]
        for _ in range(40):
            docs.append("".join(rng.choice(alpha, rng.integers(0, 120))))
        for k, window in ((5, 8), (3, 4), (2, 1), (5, 200)):
            ds = rd.from_items(
                [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
            ).repartition(7)
            got = {
                r["doc_id"]: list(r["fingerprints"])
                for r in add_rolling_fingerprints(
                    ds, k=k, window=window
                ).take_all()
            }
            for i, t in enumerate(docs):
                assert got[i] == _winnow_doc(t, k, window), (i, k, window, t)

    def test_null_text_is_empty(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.text.analysis import (
            _winnow_doc,
            add_rolling_fingerprints,
        )

        ds = rd.from_arrow(pa.table({"text": pa.array(["abc", None, "xyz"])}))
        rows = add_rolling_fingerprints(ds).take_all()
        assert list(rows[1]["fingerprints"]) == _winnow_doc("", 5, 8)


class TestSpanDedup:
    """span_dedup: C4-style global span dedup + reassembly (round 5)."""

    def _brute(self, rows, W):
        # reference: first global occurrence of each span by (id, ord)
        seen = {}
        for doc_id, text in rows:
            words = text.split(" ")
            for ord_ in range((len(words) + W - 1) // W):
                span = " ".join(words[ord_ * W : ord_ * W + W])
                seen.setdefault(span, (doc_id, ord_))
        out = {}
        for doc_id, text in rows:
            words = text.split(" ")
            kept = []
            for ord_ in range((len(words) + W - 1) // W):
                span = " ".join(words[ord_ * W : ord_ * W + W])
                if seen[span] == (doc_id, ord_):
                    kept.append(span)
            if kept:
                out[doc_id] = " ".join(kept)
        return out

    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.dedup import span_dedup

        rows = [
            (1, "a b c d e f"),          # spans: "a b c", "d e f"
            (2, "a b c x y z"),          # first span is a dup -> dropped
            (3, "d e f"),                 # entire doc is a dup -> vanishes
            (4, "x y z a b c d e f g"),  # tail "g" short span survives
            (5, "g"),                     # dup of doc 4's tail -> vanishes
            (6, ""),                      # empty text: span "" survives once
        ]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        got = (
            span_dedup(rd.from_arrow(t).repartition(4), span_words=3)
            .to_pandas()
            .set_index("doc_id")["text_dedup"]
            .to_dict()
        )
        assert got == self._brute(rows, 3)

    def test_matches_duckdb_at_sf(self, docs_ds, sf_dir):
        from osmptparser_ray.text.dedup import span_dedup

        mine = (
            span_dedup(docs_ds.repartition(5), span_words=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.sql(
                "WITH words AS (SELECT doc_id, string_split(text, ' ') AS w "
                f"FROM '{sf_dir}/documents.parquet'), "
                "spans AS (SELECT doc_id, unnest(range(0, CAST(ceil(len(w)/3.0) "
                "AS BIGINT))) AS ord, w FROM words), "
                "s2 AS (SELECT doc_id, ord, array_to_string(w[ord*3+1 : ord*3+3], ' ') "
                "AS span FROM spans), "
                "kept AS (SELECT doc_id, ord, span, ROW_NUMBER() OVER "
                "(PARTITION BY span ORDER BY doc_id, ord) AS rn FROM s2) "
                "SELECT doc_id, string_agg(span, ' ' ORDER BY ord) AS text_dedup "
                "FROM kept WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id"
            )
            .df()
            .reset_index(drop=True)
        )
        assert mine.equals(oracle)

    def test_ord_bits_guard_is_loud(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.dedup import span_dedup

        t = pa.table(
            {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["a b c d e"], pa.string())}
        )
        with pytest.raises(Exception, match="ord_bits"):
            span_dedup(rd.from_arrow(t), span_words=1, ord_bits=2).to_pandas()


class TestRepetitionRatio:
    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.analysis import add_repetition_ratio

        texts = [
            "a b a b a b",     # grams: ab ba ab ba ab -> 5 total, 2 unique
            "a b c d",         # all unique
            "x",               # no grams
            "",                # one empty word, no grams
            "a a a a a a a a", # 7 grams, 1 unique
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = (
            add_repetition_ratio(rd.from_arrow(t).repartition(3), "text", n=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, text in enumerate(texts):
            w = text.split(" ")
            grams = [(w[j], w[j + 1]) for j in range(len(w) - 1)]
            assert out.n_grams[i] == len(grams)
            assert out.n_unique_grams[i] == len(set(grams))
            expect = 1.0 - len(set(grams)) / max(len(grams), 1)
            assert out.rep_ratio[i] == expect

    def test_trigram_mode(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.text.analysis import add_repetition_ratio

        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b c a b c a b c"], pa.string())}
        )
        out = add_repetition_ratio(rd.from_arrow(t), "text", n=3).to_pandas()
        # 7 trigrams, 3 unique (abc, bca, cab)
        assert out.n_grams[0] == 7 and out.n_unique_grams[0] == 3


class TestModePerGroup:
    def test_matches_duckdb(self, ray_session, sf_dir):
        import ray.data as rd

        from osmptparser_ray.stages.relational import mode_per_group

        ev = rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ).repartition(6)
        mine = (
            mode_per_group(ev, "user_id", "event_type")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        oracle = (
            duckdb.sql(
                "SELECT user_id, event_type, cnt FROM ("
                "SELECT user_id, event_type, count(*) AS cnt, "
                "ROW_NUMBER() OVER (PARTITION BY user_id "
                "ORDER BY count(*) DESC, event_type ASC) AS rn "
                f"FROM '{sf_dir}/events.parquet' GROUP BY user_id, event_type) t "
                "WHERE rn = 1 ORDER BY user_id"
            )
            .df()
            .reset_index(drop=True)
        )
        assert mine.equals(oracle)

    def test_tie_breaks_to_smallest_value(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.relational import mode_per_group

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1], pa.int64()),
                "v": pa.array(["b", "b", "a", "a"], pa.string()),
            }
        )
        out = mode_per_group(rd.from_arrow(t).repartition(2), "k", "v").to_pandas()
        assert list(out.v) == ["a"] and list(out.cnt) == [2]


class TestRound5EmptyInputs:
    def test_new_ops_handle_empty(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.relational import mode_per_group, unpivot
        from osmptparser_ray.text.analysis import add_repetition_ratio
        from osmptparser_ray.text.dedup import span_dedup

        e_docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        )
        e_kv = rd.from_arrow(
            pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
        )
        assert len(span_dedup(e_docs).to_pandas()) == 0
        assert len(add_repetition_ratio(e_docs).to_pandas()) == 0
        assert len(mode_per_group(e_kv, "k", "v").to_pandas()) == 0
        assert len(unpivot(e_kv, ["k"], ["v"]).to_pandas()) == 0
