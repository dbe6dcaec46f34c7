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
