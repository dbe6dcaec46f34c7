"""Tokenizer unit tests (SURVEY §2.3 M4; reference mk_page_vector.py:21-26)."""

import numpy as np

from pears_lite_ray.vocab import RegexTokenizer, SpmTokenizer, Vocab, term_hash_id

MINI_VOCAB = [
    ("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
    ("▁the", -2.9), ("▁water", -8.0), ("melon", -10.0), ("▁cat", -7.0),
    ("▁", -3.0), ("w", -9.0), ("a", -8.5), ("t", -8.2), ("e", -8.1),
    ("r", -8.3), ("m", -9.1), ("l", -9.2), ("o", -8.8), ("n", -8.6),
    ("c", -9.0), ("h", -9.4), ("s", -8.4), ("▁wat", -11.0),
]


def mini():
    return Vocab([p for p, _ in MINI_VOCAB], [lp for _, lp in MINI_VOCAB])


def test_vocab_dedup_and_weights():
    v = Vocab(["a", "b", "a", "", "c"], [-1.0, -2.0, -3.0, -4.0, -5.0])
    assert v.size == 3
    assert v.piece_to_id == {"a": 0, "b": 1, "c": 2}
    # weights are negated logprobs (reference readers.py:12)
    assert np.allclose(v.weight, [1.0, 2.0, 5.0])


def test_viterbi_prefers_whole_pieces():
    tok = SpmTokenizer(mini())
    assert tok.encode_pieces("the") == ["▁the"]
    # ▁water + melon (−18) beats char paths and ▁wat+... (−11−…)
    assert tok.encode_pieces("watermelon") == ["▁water", "melon"]
    assert tok("The watermelon") == "▁the ▁water melon"


def test_viterbi_unknown_chars_surface():
    tok = SpmTokenizer(mini())
    pieces = tok.encode_pieces("the qx")
    assert pieces[0] == "▁the"
    # q and x are not in the mini vocab; they surface as single chars
    assert "q" in pieces and "x" in pieces


def test_encode_ids_positions_skips_oov_but_keeps_positions():
    tok = SpmTokenizer(mini())
    ids, pos = tok.encode_ids_positions("the qx cat")
    v = mini()
    # pieces: ▁the, ▁(+q), q, x?, ... positions count all pieces incl. OOV
    assert v.pieces[ids[0]] == "▁the"
    assert pos[0] == 0
    assert all(b > a for a, b in zip(pos, pos[1:]))


def test_word_boundary_independence():
    tok = SpmTokenizer(mini())
    a = tok.encode_pieces("the cat")
    assert a == tok.encode_pieces("the") + tok.encode_pieces("cat")


def test_reference_vocab_loads(ref_vocab):
    assert ref_vocab.size == 16000  # deduplicated size (SURVEY §1.1)
    assert ref_vocab.get("▁the") is not None


def test_reference_tokenizer_subword_split(spm_tokenizer):
    pieces = spm_tokenizer.encode_pieces("watermelon")
    assert pieces[0].startswith("▁")
    assert len(pieces) >= 2  # subword continuation exists for phrase tests
    joined = "".join(p.lstrip("▁") for p in pieces)
    assert joined == "watermelon"


def test_regex_tokenizer_matches_duckdb_split():
    import duckdb

    texts = ["Hello, World! 42 times", "the quick-brown fox_9"]
    tok = RegexTokenizer()
    for t in texts:
        ours = tok.encode_pieces(t)
        sql = duckdb.sql(
            "select list_filter(regexp_split_to_array(lower($t), '[^a-z0-9]+'), x -> x <> '')",
            params={"t": t},
        ).fetchone()[0]
        assert ours == sql


def test_regex_tokenizer_hash_ids_deterministic():
    tok = RegexTokenizer()
    ids, pos = tok.encode_ids_positions("the cat the")
    assert ids[0] == ids[2] == term_hash_id("the")
    assert pos == [0, 1, 2]
    assert 0 <= ids[1] < (1 << 63)


def test_term_hash_id_sql_replica_parity():
    """term_hash_id = splitmix64(fnv1a(word)) & (2^63-1): the pods_route
    oracle replicates it in DuckDB (sql_mix64 ∘ sql_fnv1a) and relies on
    the 63-bit mask being a no-op modulo the centroid bucket count."""
    import duckdb

    from pears_lite_ray.index.pods import CENTROID_DIM
    from pears_lite_ray.pipelines.common import sql_fnv1a, sql_mix64

    words = ["the", "a", "spark", "merge", "window", "zzz9", "x" * 40]
    exprs = ", ".join(
        f"({sql_mix64(sql_fnv1a(repr(w)))})::UBIGINT" for w in words
    )
    sql_vals = duckdb.sql(f"SELECT {exprs}").fetchone()
    for w, sv in zip(words, sql_vals):
        h = term_hash_id(w)
        assert h == int(sv) & ((1 << 63) - 1)
        assert h % CENTROID_DIM == int(sv) % CENTROID_DIM  # mask no-op mod dim


def test_viterbi_probe_matches_first_char_scan_reference(spm_tokenizer):
    """The substring-probe Viterbi (vocab.py:96) must segment identically to
    the round-1..3 first-char-scan formulation — same DP, same tie-breaks.
    Reference reimplemented here over the real 16k vocab; random words mix
    known pieces, unknown chars and long runs."""
    import random

    from pears_lite_ray.vocab import SPACE_PIECE

    tok = spm_tokenizer
    by_prefix = {}
    for p, i in tok.vocab.piece_to_id.items():
        by_prefix.setdefault(p[0], []).append((p, tok.vocab.logprob[i]))

    def reference(word):
        s = SPACE_PIECE + word
        n = len(s)
        best = [float("-inf")] * (n + 1)
        best[0] = 0.0
        back = [None] * (n + 1)
        for i in range(n):
            bi = best[i]
            if bi == float("-inf"):
                continue
            matched = False
            for piece, score in by_prefix.get(s[i], ()):
                j = i + len(piece)
                if j <= n and s.startswith(piece, i):
                    matched = True
                    sc = bi + score
                    if sc > best[j]:
                        best[j] = sc
                        back[j] = (i, piece)
            if not matched or best[i + 1] == float("-inf"):
                sc = bi + tok.unk_score
                if sc > best[i + 1]:
                    best[i + 1] = sc
                    back[i + 1] = (i, s[i])
        out, j = [], n
        while j > 0:
            i, piece = back[j]
            out.append(piece)
            j = i
        return tuple(reversed(out))

    rng = random.Random(7)
    pieces = [p.lstrip(SPACE_PIECE) for p in list(tok.vocab.piece_to_id)[:500]]
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789é漢"
    for _ in range(120):
        kind = rng.random()
        if kind < 0.4:
            w = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 4)))
        elif kind < 0.8:
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        else:
            w = rng.choice(pieces) + "".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 6))
            )
        w = w or "a"
        assert tok._segment_word_impl(w) == reference(w), w
