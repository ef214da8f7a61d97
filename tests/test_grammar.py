"""Grammar/valence decoding mask (generate/grammar.py).

Key property: the mask is PERMISSIVE — every token of every valid SMILES in
the 154-drug corpus must be admitted at its position (including the closing
EOS), while obvious garbage continuations are pruned.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from singa_tpu.chem.drug_corpus import CORPUS
from singa_tpu.chem.tokenizer import split_smiles
from singa_tpu.config import EOS_TOKEN, SMI_VOCAB
from singa_tpu.generate import grammar


def _ids(smi: str) -> list[int]:
    return [SMI_VOCAB.index(t) for t in split_smiles(smi)]


def _admits(smi: str) -> bool:
    """True if the mask admits every token of `smi` followed by EOS."""
    state = grammar.init_state(())
    for tid in _ids(smi) + [EOS_TOKEN]:
        ok = grammar.allowed_tokens(state)
        if not bool(ok[tid]):
            return False
        state = grammar.update(state, jnp.asarray(tid))
    return True


def _trace(smi: str):
    """Mask value per position, for debugging a rejection."""
    state = grammar.init_state(())
    out = []
    for tok in split_smiles(smi) + ["$"]:
        tid = SMI_VOCAB.index(tok)
        out.append((tok, bool(grammar.allowed_tokens(state)[tid])))
        state = grammar.update(state, jnp.asarray(tid))
    return out


def test_corpus_fully_admitted():
    rejected = []
    for _name, smi in CORPUS:
        try:
            ids = _ids(smi)
        except ValueError:
            continue  # token outside the 116-vocab — not decodable anyway
        if not _admits(smi):
            bad = [t for t, ok in _trace(smi) if not ok]
            rejected.append((smi, bad))
    assert not rejected, f"mask rejected valid corpus SMILES: {rejected[:5]}"


@pytest.mark.parametrize(
    "smi",
    [
        "C",
        "CC(=O)Oc1ccccc1C(=O)O",  # aspirin
        "C1CC1",
        "C(F)(Cl)(Br)I",
        "N#Cc1ccccc1",
        "C=1CC=1",  # bond before ring digit
        "CC.OC",  # dot-separated fragments
        "[NH3+]CC(=O)[O-]",  # zwitterion
        "c1ccc2ccccc2c1",  # fused rings
        "C(=O)(O)C",  # branch-first
        "F/C=C/F",  # cis/trans markers
    ],
)
def test_valid_smiles_admitted(smi):
    assert _admits(smi), _trace(smi)


@pytest.mark.parametrize(
    "prefix,bad_tok",
    [
        ("", ")"),  # close with nothing open
        ("", "="),  # bond with no atom
        ("", "$"),  # empty molecule
        ("", "1"),  # ring digit with no atom
        ("C", "^"),  # PAD mid-sequence
        ("C(", ")"),  # empty branch
        ("C(", "("),  # '((' nesting without an atom
        ("C=", "="),  # stacked bonds
        ("C=", ")"),  # close right after a bond
        ("C=", "$"),  # EOS right after a bond
        ("C1CC", "$"),  # EOS with an open ring
        ("C1", "1"),  # self-ring closure on the opening atom
        ("C1=", "1"),  # ...also via a pending bond (the C1=1 beam bug)
        ("C12", "2"),  # self-closure of a second digit on the same atom
        ("C(C", "$"),  # EOS with an open branch
        ("CF", "C"),  # bonded F has no free valence for a second bond
        ("CF", "("),  # ...nor a branch
        ("CF", "1"),  # ...nor a ring bond
        ("C=O", "C"),  # O exhausted by the double bond
        ("C(F)(F)(F)F", "C"),  # carbon's 4 bonds used up
        ("CC", "#"),  # triple bond exceeds remaining C valence (3 ok) — allowed!
    ],
)
def test_garbage_pruned(prefix, bad_tok):
    if (prefix, bad_tok) == ("CC", "#"):
        pytest.skip("CC#N is valid; kept here as a reminder, not a rule")
    state = grammar.init_state(())
    for tid in _ids(prefix):
        state = grammar.update(state, jnp.asarray(tid))
    ok = grammar.allowed_tokens(state)
    assert not bool(ok[SMI_VOCAB.index(bad_tok)]), _trace(prefix + bad_tok)


def test_dot_can_be_disallowed():
    state = grammar.init_state(())
    state = grammar.update(state, jnp.asarray(SMI_VOCAB.index("C")))
    dot = SMI_VOCAB.index(".")
    assert bool(grammar.allowed_tokens(state, allow_dot=True)[dot])
    assert not bool(grammar.allowed_tokens(state, allow_dot=False)[dot])


def test_batched_shapes():
    state = grammar.init_state((2, 3))
    ok = grammar.allowed_tokens(state)
    assert ok.shape == (2, 3, len(SMI_VOCAB))
    tok = jnp.full((2, 3), SMI_VOCAB.index("C"), jnp.int32)
    state = grammar.update(state, tok)
    assert state.cur_val.shape == (2, 3)
    assert state.stack.shape == (2, 3, grammar.MAX_DEPTH)


def test_mask_never_all_false():
    # A deliberately weird (but reachable) state still offers EOS.
    state = grammar.init_state(())
    for t in _ids("C(F)"):
        state = grammar.update(state, jnp.asarray(t))
    ok = grammar.allowed_tokens(state)
    assert bool(jnp.any(ok))


def test_forced_eos_flagged():
    # "C1=O" with allow_dot=False: ring 1 open, O's valence exhausted by the
    # double bond -> nothing admissible -> safety-valve EOS, flagged forced.
    state = grammar.init_state(())
    for t in _ids("C1=O"):
        state = grammar.update(state, jnp.asarray(t))
    ok, forced = grammar.allowed_tokens(state, allow_dot=False, return_forced=True)
    assert bool(forced)
    assert bool(ok[EOS_TOKEN])
    assert int(jnp.sum(ok)) == 1  # EOS is the only escape
    # with '.' allowed the beam can continue a new fragment: not forced
    ok2, forced2 = grammar.allowed_tokens(state, allow_dot=True, return_forced=True)
    assert not bool(forced2)
    # a naturally finishable state is never flagged
    state3 = grammar.init_state(())
    for t in _ids("CC"):
        state3 = grammar.update(state3, jnp.asarray(t))
    ok3, forced3 = grammar.allowed_tokens(state3, allow_dot=False, return_forced=True)
    assert not bool(forced3)
    assert bool(ok3[EOS_TOKEN])


def test_masked_beam_search_emits_grammatical_tokens():
    """Beam search over RANDOM logits + grammar mask: every decoded sequence
    must replay through the grammar with every token admitted (the mask is
    respected inside the while_loop, including beam reordering)."""
    import jax

    from singa_tpu.config import PAD_TOKEN, SOS_TOKEN
    from singa_tpu.generate.beam import beam_search

    V = len(SMI_VOCAB)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (64, V))  # fixed pseudo-logits per step

    def decode_fn(tokens, cur_len, cache):
        # position+last-token dependent logits; no model needed
        last = tokens[:, jnp.maximum(cur_len - 1, 0)]
        return table[(last + cur_len) % 64] * 3.0, cache

    tokens, _ = jax.jit(
        lambda: beam_search(
            decode_fn,
            batch_size=2,
            num_beams=4,
            max_length=24,
            topk=2,
            grammar_mask=True,
            allow_dot=False,
        )
    )()
    tokens = np.asarray(tokens).reshape(-1, tokens.shape[-1])
    for seq in tokens:
        state = grammar.init_state(())
        for tid in seq[1:]:  # position 0 is SOS
            tid = int(tid)
            if tid == PAD_TOKEN:
                break
            ok = grammar.allowed_tokens(state, allow_dot=False)
            assert bool(ok[tid]), (seq, tid, SMI_VOCAB[tid])
            state = grammar.update(state, jnp.asarray(tid))
            if tid == EOS_TOKEN:
                break
        assert int(seq[0]) == SOS_TOKEN


def test_forced_eos_beams_demoted():
    """Beams that finish only via the safety valve (or are flushed with an
    open ring) carry the FORCED_EOS_PENALTY, so any natural completion
    outranks them."""
    import jax

    from singa_tpu.generate.beam import FORCED_EOS_PENALTY, beam_search

    V = len(SMI_VOCAB)
    C, O, EQ, ONE = (SMI_VOCAB.index(t) for t in ("C", "O", "=", "1"))

    # per-step preferred tokens steering every beam into the C1=O corner
    prefs = np.zeros((6, V), np.float32)
    prefs[1][C], prefs[1][O] = 5.0, 4.9
    prefs[2][ONE] = 5.0
    prefs[3][EQ] = 5.0
    prefs[4][O] = 5.0
    prefs[5][EOS_TOKEN] = 5.0
    table = jnp.asarray(prefs)

    def decode_fn(tokens, cur_len, cache):
        row = table[jnp.minimum(cur_len, 5)]
        return jnp.broadcast_to(row, (tokens.shape[0], V)), cache

    _, scores = jax.jit(
        lambda: beam_search(
            decode_fn, batch_size=1, num_beams=2, max_length=8,
            topk=2, grammar_mask=True, allow_dot=False,
        )
    )()
    # every hypothesis ended through the valve: all scores sunk by >= penalty
    assert float(jnp.max(scores)) < -FORCED_EOS_PENALTY / 2

    # flush path: too-short max_length leaves the ring open at the end
    _, scores2 = jax.jit(
        lambda: beam_search(
            decode_fn, batch_size=1, num_beams=2, max_length=4,
            topk=1, grammar_mask=True, allow_dot=False,
        )
    )()
    assert float(scores2[0, 0]) < -FORCED_EOS_PENALTY / 2


def test_capacity_table_spot_values():
    cap = np.asarray(grammar.ATOM_CAPACITY)
    v = {t: int(cap[i]) for i, t in enumerate(SMI_VOCAB)}
    assert v["C"] == 4 and v["c"] == 4
    assert v["F"] == 1 and v["Cl"] == 1 and v["Br"] == 1
    assert v["O"] == 2
    assert v["[O-]"] == 1
    assert v["[N+]"] == 6  # base 5 (permissive hypervalent) + 1
    assert v["[NH3+]"] == 3
    assert v["[C@@H]"] == 3
    assert v["[B-]"] == 4  # borate binds four
    assert v["[2H]"] == 1


# --- aromatic-ring feasibility (round-4 kekulisation rules) ---


@pytest.mark.parametrize(
    "smi",
    [
        "c1ccccc1",          # benzene
        "c1ccncc1",          # pyridine
        "c1cc[nH]c1",        # pyrrole
        "c1ccoc1",           # furan
        "c1ccsc1",           # thiophene
        "c1ccc2ccccc2c1",    # naphthalene
        "Cc1ccccc1",         # toluene
        "c1ccc(-c2ccccc2)cc1",  # biphenyl (explicit single bond)
        "c1ccc2[nH]ccc2c1",  # indole
        "O=C(O)c1ccccc1O",   # salicylic acid
        "c1cnc2[nH]ccc2c1",  # azaindole
        "C1CC1",             # cyclopropane (non-aromatic 3-ring stays legal)
        "C1CCC1",            # cyclobutane
    ],
)
def test_aromatic_valids_still_admitted(smi):
    assert _admits(smi), _trace(smi)


@pytest.mark.parametrize(
    "prefix, bad_tok",
    [
        ("c1c", "1"),        # aromatic 3-ring
        ("c1cc", "1"),       # aromatic 4-ring
        ("c1cnc", "1"),      # aromatic 4-ring w/ heteroatom
        ("c1cccc", "1"),     # cyclopentadienyl: all-plain-c 5-ring
        ("c1cccccc", "1"),   # tropylium: all-plain-c 7-ring
        ("c", "C"),          # stray aromatic atom must open a ring digit
        ("c", "("),
        ("Cc1ccccc1c", "C"), # stray aromatic after a closed ring
    ],
)
def test_kekulisation_traps_pruned(prefix, bad_tok):
    state = grammar.init_state(())
    for tid in _ids(prefix):
        state = grammar.update(state, jnp.asarray(tid))
    ok = grammar.allowed_tokens(state)
    assert not bool(ok[SMI_VOCAB.index(bad_tok)]), _trace(prefix + bad_tok)


@pytest.mark.parametrize(
    "smi",
    [
        "c1cc[c-]c1",        # cyclopentadienyl anion: bracket resets purity
        "c1ccc(C)c1C",       # 5-ring with branch: purity dropped, admitted
    ],
)
def test_charged_or_branched_aromatic_5ring_admitted(smi):
    assert _admits(smi), _trace(smi)
