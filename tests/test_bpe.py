"""BPE tokenizer tests: differential vs the HuggingFace Rust implementation
(the library the reference uses), over the released 500-token DNA vocabulary."""

import numpy as np
import pytest

from variantformer_tpu.utils.bpe import BPETokenizer

try:
    from variantformer_tpu.utils.assets import resolve_vocab_path

    VOCAB_PATH = resolve_vocab_path("bpe_vocabulary_500.json")
except FileNotFoundError:
    VOCAB_PATH = None

pytestmark = pytest.mark.skipif(VOCAB_PATH is None, reason="vocab not available")


@pytest.fixture(scope="module")
def tok():
    return BPETokenizer.from_file(VOCAB_PATH)


@pytest.fixture(scope="module")
def hf_tok():
    tokenizers = pytest.importorskip("tokenizers")
    return tokenizers.Tokenizer.from_file(VOCAB_PATH)


def _random_dna(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


def test_matches_huggingface_on_random_dna(tok, hf_tok):
    import random

    rng = random.Random(0)
    for trial in range(20):
        n = rng.randint(1, 2000)
        seq = _random_dna(rng, n)
        ours, _ = tok.encode_strand([seq])
        theirs = hf_tok.encode(seq).ids
        assert ours == theirs, f"trial {trial}: mismatch on length {n}"


def test_matches_huggingface_with_iupac_codes(tok, hf_tok):
    import random

    rng = random.Random(1)
    alphabet = "ACGTRYSWKMBDHV"
    for trial in range(10):
        seq = _random_dna(rng, rng.randint(10, 500), alphabet)
        ours, _ = tok.encode_strand([seq])
        theirs = hf_tok.encode(seq).ids
        assert ours == theirs


def test_normalize_splits_on_n():
    subs = BPETokenizer.normalize(["ACGTNNNGGG", "nnn", "acgt"])
    assert subs == ["ACGT", "GGG", "ACGT"]


def test_encode_both_strands(tok):
    ids_f, tok_f, ids_r, tok_r = tok.encode(["ACGTACGT", "A"])
    assert "".join(tok_f) == "ACGTACGT"
    assert ids_r == [tok.vocab["A"]]


def test_encode_with_position_tracks_through_n_runs(tok):
    seq = "ACGT" + "N" * 7 + "GGCCA" * 40
    # position inside the second subsequence
    pos = 4 + 7 + 13
    d = tok.encode_with_position(seq, pos)
    # reconstruct: tokens of subseq 2 start after tokens of subseq 1
    sub1_ids, _ = tok.encode_strand(["ACGT"])
    assert d["target_subsequence"] == "GGCCA" * 40
    offsets = d["offsets"]
    tid = d["position_id"] - len(sub1_ids)
    start, end = offsets[tid]
    assert start <= 13 < end
    # the covering token's characters include the target base
    assert d["position_token"] == d["target_subsequence"][start:end]


def test_encode_with_position_invalid_char(tok):
    with pytest.raises(ValueError):
        tok.encode_with_position("ACGTN", 4)


def test_long_sequence_round_trip(tok):
    import random

    rng = random.Random(2)
    seq = _random_dna(rng, 50_000)
    ids, toks = tok.encode_strand([seq])
    assert "".join(toks) == seq
    assert tok.decode(ids) == seq


def test_native_matches_python(tok):
    """The C++ engine must agree with the pure-Python reference exactly."""
    import json
    import random

    if tok._native is None:
        pytest.skip("native library not built")
    data = json.load(open(VOCAB_PATH))
    merges = [
        tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
        for m in data["model"]["merges"]
    ]
    py = BPETokenizer(data["model"]["vocab"], merges, use_native=False)
    rng = random.Random(5)
    for _ in range(10):
        seq = _random_dna(rng, rng.randint(1, 3000), "ACGTRYSWKMBDHV")
        ids_n, offs_n = tok._encode_word(seq)
        ids_p, offs_p = py._encode_word_py(seq)
        assert ids_n == ids_p
        assert offs_n == offs_p


def test_train_bpe_matches_hf_trainer(tmp_path):
    """train_bpe reproduces HuggingFace's BpeTrainer vocabulary exactly
    (reference utils/seq.py:176-202 delegates to BpeTrainer)."""
    import numpy as np

    tokenizers = pytest.importorskip("tokenizers")
    from variantformer_tpu.utils.bpe import save_vocabulary, train_bpe
    from variantformer_tpu.utils.constants import SPECIAL_TOKENS

    rng = np.random.default_rng(3)
    seqs = [
        "".join(rng.choice(list("ACGT"), rng.integers(30, 300)))
        for _ in range(50)
    ]
    seqs += ["ACGTNNNACGTRYACGT", "acgtacgtNNacgt", "ACGTWSKMBDHV"]

    vocab, merges = train_bpe(seqs, 128)

    tok = tokenizers.Tokenizer(tokenizers.models.BPE())
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=128, min_frequency=2,
        special_tokens=list(SPECIAL_TOKENS.values()),
    )
    tok.train_from_iterator(BPETokenizer.normalize(seqs), trainer)
    assert vocab == tok.get_vocab()

    # Round trip: saved vocabulary loads and tokenizes losslessly.
    path = tmp_path / "trained.json"
    save_vocabulary(str(path), vocab, merges)
    loaded = BPETokenizer.from_file(str(path))
    seq = seqs[0]
    ids, toks = loaded.encode_strand([seq])
    assert "".join(toks) == seq


def test_matches_huggingface_on_homopolymer_runs(tok, hf_tok):
    """Runs of one symbol are where merge ORDER matters most (overlapping
    same-rank occurrences must resolve leftmost-first): the native bucket
    queue sorts each rank bucket by position to preserve that. Also mixes
    run/random boundaries where late-formed pairs land mid-bucket."""
    import random

    rng = random.Random(7)
    for trial in range(30):
        parts = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.6:
                parts.append(rng.choice("ACGT") * rng.randint(1, 64))
            else:
                parts.append(_random_dna(rng, rng.randint(1, 32)))
        seq = "".join(parts)
        ours, _ = tok.encode_strand([seq])
        theirs = hf_tok.encode(seq).ids
        assert ours == theirs, f"trial {trial}: {seq[:80]}..."


def test_matches_huggingface_on_long_sequence(tok, hf_tok):
    """Gene-window scale (300 kb): the scheduling path that matters for
    host-build throughput."""
    import random

    rng = random.Random(3)
    seq = _random_dna(rng, 300_000)
    ours, _ = tok.encode_strand([seq])
    theirs = hf_tok.encode(seq).ids
    assert ours == theirs


def test_concurrent_encodes_are_isolated(tok):
    """The native scratch is thread_local; concurrent encodes must not
    interleave state (the sweep builders tokenize from 4 threads)."""
    from concurrent.futures import ThreadPoolExecutor

    import random

    rng = random.Random(11)
    seqs = [_random_dna(rng, rng.randint(500, 20_000)) for _ in range(16)]
    expected = [tok.encode_ids(s).tolist() for s in seqs]
    with ThreadPoolExecutor(max_workers=4) as pool:
        got = list(pool.map(lambda s: tok.encode_ids(s).tolist(), seqs * 4))
    assert got == (expected * 4)


def test_encode_ids_batch_matches_sequential(tok):
    """encode_ids_batch (one native call) == per-sequence encode_ids,
    including empty and all-N sequences that normalize to zero words."""
    import random

    rng = random.Random(13)
    seqs = ["", "NNN", "ACGTNNNACGT"] + [
        _random_dna(rng, rng.randint(1, 3000), "ACGTN") for _ in range(20)
    ]
    batch = tok.encode_ids_batch(seqs)
    for s, got in zip(seqs, batch):
        np.testing.assert_array_equal(got, tok.encode_ids(s))
