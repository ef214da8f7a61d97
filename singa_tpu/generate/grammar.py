"""SMILES grammar + valence masking for on-device decoding.

The reference intends chemically-masked decoding (model/Masking.py:19 holds
the masking hook; BASELINE.json's north star names "masked top-k and valence
masking" during beam decode) but never wires it into BeamSearch.py. Here it
is first-class: a per-step boolean mask over the 116-token vocabulary,
computed incrementally from a compact per-beam grammar state inside
``lax.while_loop`` (static shapes, table lookups only — no host round trip).

Design rule: the mask must be *permissive* — it may admit some invalid
SMILES (exact validation stays host-side in chem/smiles_parser.py) but must
never exclude a valid continuation. Two deliberate approximations, both on
the permissive side:

- branch valence: on ``(`` we push ``cur_val - 1`` (a branch consumes at
  least one bond from its attachment atom; if its first bond is ``=``/``#``
  the popped value over-estimates remaining valence);
- ring closures debit only the closing atom (the opening atom's share was
  already debited when the digit opened the ring), and aromatic bonds are
  counted at order 1.

State per beam (all int32 for TPU friendliness):
  depth     paren nesting depth
  rings     9-bit mask of open ring-bond digits
  pending   bond order demanded by a just-seen bond token (0 = default single)
  cur_val   remaining valence of the current attachment atom (NONE if none)
  stack     [MAX_DEPTH] saved cur_val values of enclosing attachment atoms
  last      class of the previous token (SOS/ATOM/BOND/OPEN/CLOSE/DIGIT/DOT)
  cur_atom  id of the current attachment atom (-1 none); atom_n the counter;
  astack    [MAX_DEPTH] saved cur_atom per branch; ring_atom [9] the atom
            that opened each ring digit (self-ring closures are pruned)
"""
from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import EOS_TOKEN, PAD_TOKEN, SMI_VOCAB, SOS_TOKEN

MAX_DEPTH = 24
NONE_VAL = -99  # cur_val sentinel: no attachment atom (start / after '.')

# token classes
ATOM, BOND, OPEN, CLOSE, DIGIT, DOT, EOS, SOS, PAD = range(9)

# Permissive max valences. Hypervalent forms that appear in real datasets
# (N(=O)=O nitro, S(=O)(=O) sulfonyl, hypervalent I) are admitted; the exact
# host-side parser rejects what these allow.
_BASE_VALENCE = {
    "B": 3, "C": 4, "N": 5, "O": 2, "F": 1, "P": 5, "S": 6,
    "Cl": 1, "Br": 1, "I": 5, "H": 1, "Si": 4, "Se": 6, "Sn": 4,
    "Sb": 5, "As": 5, "Al": 3,
}
_METAL_VALENCE = 8  # Fe/Zn/Na/K/... — effectively unconstrained

_BRACKET_RE = re.compile(
    r"^\[(?P<iso>\d+)?(?P<el>[A-Z][a-z]?|[a-z]{1,2})(?P<chi>@{1,2})?"
    r"(?P<h>H\d*)?(?P<chg>[+-]+\d*|[+-]\d*)?\]$"
)


def _atom_capacity(tok: str) -> int:
    """Max bonds this atom token can still form, from its SMILES spelling."""
    if not tok.startswith("["):
        el = tok if tok in _BASE_VALENCE else tok.capitalize()  # c -> C
        return _BASE_VALENCE.get(el, _METAL_VALENCE)
    m = _BRACKET_RE.match(tok)
    if m is None:  # exotic spellings: be permissive
        return _METAL_VALENCE
    el = m.group("el")
    el_key = el.capitalize() if el.islower() else el
    base = _BASE_VALENCE.get(el_key, _METAL_VALENCE)
    h = m.group("h")
    nh = 0 if h is None else (1 if h == "H" else int(h[1:]))
    chg = m.group("chg") or ""
    charge = 0
    if chg:
        sign = 1 if chg[0] == "+" else -1
        digits = chg.lstrip("+-")
        charge = sign * (int(digits) if digits else len(chg))
    if el_key in ("B", "Al"):
        charge = -charge  # borate-type anions GAIN a bond ([B-] binds 4)
    # cation gains a bonding site (N+ -> 4), anion loses one (O- -> 1)
    cap = base + charge - nh
    return max(cap, 1)  # never fully forbid an atom the vocab offers


def _is_aromatic_token(tok: str) -> bool:
    """Lowercase-element atom tokens: c n o p s se, bracketed or not."""
    if tok.startswith("["):
        m = _BRACKET_RE.match(tok)
        el = m.group("el") if m else ""
        return bool(el) and el.islower()
    return tok in ("c", "n", "o", "p", "s")


def _build_tables():
    V = len(SMI_VOCAB)
    cls = np.full(V, ATOM, np.int32)
    cap = np.zeros(V, np.int32)
    order = np.zeros(V, np.int32)
    digit = np.zeros(V, np.int32)
    arom = np.zeros(V, np.int32)
    plain_c = np.zeros(V, np.int32)
    for i, tok in enumerate(SMI_VOCAB):
        if i == SOS_TOKEN:
            cls[i] = SOS
        elif i == EOS_TOKEN:
            cls[i] = EOS
        elif i == PAD_TOKEN:
            cls[i] = PAD
        elif tok == "(":
            cls[i] = OPEN
        elif tok == ")":
            cls[i] = CLOSE
        elif tok == ".":
            cls[i] = DOT
        elif tok in ("-", "/", "\\"):
            cls[i] = BOND
            order[i] = 1
        elif tok == "=":
            cls[i] = BOND
            order[i] = 2
        elif tok == "#":
            cls[i] = BOND
            order[i] = 3
        elif tok.isdigit():
            cls[i] = DIGIT
            digit[i] = int(tok)
        else:
            cls[i] = ATOM
            cap[i] = _atom_capacity(tok)
            arom[i] = int(_is_aromatic_token(tok))
            plain_c[i] = int(tok == "c")
    return cls, cap, order, digit, arom, plain_c


# Kept as NUMPY at module level: this module is imported lazily from inside
# jitted functions (train/gan.py sample_sequences), and jnp.asarray at import
# time would then create leaked tracers. jnp conversion happens per-use
# below (a free constant inside jit).
(TOKEN_CLASS, ATOM_CAPACITY, BOND_ORDER, RING_DIGIT,
 IS_AROMATIC, IS_PLAIN_C) = _build_tables()


class GrammarState(NamedTuple):
    depth: jax.Array  # [...] int32
    rings: jax.Array  # [...] int32 bitmask (bit d-1 = ring digit d open)
    pending: jax.Array  # [...] int32, 0 = no explicit bond pending
    cur_val: jax.Array  # [...] int32, NONE_VAL = no attachment atom
    stack: jax.Array  # [..., MAX_DEPTH] int32
    last: jax.Array  # [...] int32 token class
    cur_atom: jax.Array  # [...] int32 id of the attachment atom (-1 = none)
    atom_n: jax.Array  # [...] int32 atoms emitted so far
    astack: jax.Array  # [..., MAX_DEPTH] int32 saved cur_atom per branch
    ring_atom: jax.Array  # [..., 9] int32 atom id that opened ring digit d
    # aromatic-ring feasibility (round 4, the kekulisation rules):
    cur_arom: jax.Array  # [...] int32 current attachment atom is aromatic
    ring_cnt: jax.Array  # [..., 9] int32 atoms emitted since digit d opened
    ring_arom: jax.Array  # [..., 9] int32 digit d opened on an aromatic atom
    ring_pure: jax.Array  # [..., 9] int32 branch-free all-plain-'c' chain so far


def init_state(shape: tuple[int, ...]) -> GrammarState:
    return GrammarState(
        depth=jnp.zeros(shape, jnp.int32),
        rings=jnp.zeros(shape, jnp.int32),
        pending=jnp.zeros(shape, jnp.int32),
        cur_val=jnp.full(shape, NONE_VAL, jnp.int32),
        stack=jnp.zeros(shape + (MAX_DEPTH,), jnp.int32),
        last=jnp.full(shape, SOS, jnp.int32),
        cur_atom=jnp.full(shape, -1, jnp.int32),
        atom_n=jnp.zeros(shape, jnp.int32),
        astack=jnp.full(shape + (MAX_DEPTH,), -1, jnp.int32),
        ring_atom=jnp.full(shape + (9,), -2, jnp.int32),
        cur_arom=jnp.zeros(shape, jnp.int32),
        ring_cnt=jnp.zeros(shape + (9,), jnp.int32),
        ring_arom=jnp.zeros(shape + (9,), jnp.int32),
        ring_pure=jnp.zeros(shape + (9,), jnp.int32),
    )


def allowed_tokens(state: GrammarState, allow_dot: bool = True,
                   return_forced: bool = False):
    """Boolean mask [..., V] of grammatically admissible next tokens.

    With ``return_forced=True`` also returns a [...] bool flag marking beams
    where NOTHING was admissible and EOS was force-allowed by the safety
    valve (such completions are invalid — e.g. an open ring with exhausted
    valence); callers should demote them in ranking."""
    last = state.last[..., None]  # broadcast against the vocab axis
    depth = state.depth[..., None]
    rings = state.rings[..., None]
    cur = state.cur_val[..., None]
    pend = state.pending[..., None]
    eff = jnp.maximum(pend, 1)  # bond order the next atom/digit would consume

    cls = jnp.asarray(TOKEN_CLASS)  # [V]
    after_atomish = (last == ATOM) | (last == DIGIT) | (last == CLOSE)
    has_attach = cur > NONE_VAL // 2

    # ATOM: syntactically everywhere except after EOS; valence-checked when
    # bonding to an existing attachment atom.
    cap_t = jnp.asarray(ATOM_CAPACITY)
    ok_atom = (cls == ATOM) & (
        ~has_attach | ((cur >= eff) & (cap_t >= eff))
    ) & (last != EOS) & (last != PAD)

    # BOND: after an atom / ring digit / branch close / branch open (C(=O)),
    # never stacked, and the attachment atom must be able to pay for it.
    ok_bond = (
        (cls == BOND)
        & (after_atomish | (last == OPEN))
        & (pend == 0)
        & (cur >= jnp.asarray(BOND_ORDER))
    )

    # OPEN: branch off an atom with spare valence.
    ok_open = (
        (cls == OPEN)
        & after_atomish
        & (cur >= 1)
        & (depth < MAX_DEPTH - 1)
        & (pend == 0)
    )

    # CLOSE: something to close, and not right after '(' / bond / '.'.
    ok_close = (cls == CLOSE) & (depth > 0) & after_atomish & (pend == 0)

    # DIGIT: ring open/close on the current atom.
    bit = jnp.where(cls == DIGIT, 1 << jnp.maximum(jnp.asarray(RING_DIGIT) - 1, 0), 0)
    is_open = (rings & bit) > 0
    ok_digit = (cls == DIGIT) & ((last == ATOM) | (last == DIGIT) | (last == BOND)) & (
        cur >= eff
    )
    # closing a ring right after a bond token is fine (C=1...); opening after
    # a bond token is also legal SMILES (the order applies to the closure) —
    # open/close share the admissibility rule above, EXCEPT that a closure on
    # the very atom that opened the digit (a self-ring, e.g. "C1=1" or "C11")
    # is never valid SMILES and must be pruned.
    didx = jnp.clip(jnp.asarray(RING_DIGIT) - 1, 0, 8)  # [V]
    opener = jnp.take(state.ring_atom, didx, axis=-1)  # [..., V]
    ok_digit = ok_digit & ~(is_open & (opener == state.cur_atom[..., None]))

    # --- aromatic-ring feasibility (kekulisation rules, round 4) ---
    # An AROMATIC closure (opener aromatic & closer aromatic & no explicit
    # bond) of ring digit d is infeasible when:
    #   * fewer than 4 atoms were emitted since d opened (true ring size <=
    #     cnt+1 <= 4: no aromatic 3/4-rings kekulise in the neutral vocab);
    #   * the chain since d opened is branch-free and ALL plain 'c' with
    #     cnt in {4, 6}: exactly c1cccc1 / c1cccccc1 — cyclopentadienyl /
    #     tropylium need a charged bracket atom, which resets ring_pure.
    # cnt counts every atom since the opener, so cnt >= true size - 1 and
    # the <4 rule never blocks a genuinely >=5 ring (permissive-safe); the
    # pure-chain rules fire only when cnt is exact (no branches).
    cnt = jnp.take(state.ring_cnt, didx, axis=-1)  # [..., V]
    op_arom = jnp.take(state.ring_arom, didx, axis=-1) > 0
    pure = jnp.take(state.ring_pure, didx, axis=-1) > 0
    arom_closure = (
        is_open & op_arom & (state.cur_arom[..., None] > 0) & (pend == 0)
    )
    bad_size = (cnt < 4) | (pure & ((cnt == 4) | (cnt == 6)))
    ok_digit = ok_digit & ~(arom_closure & bad_size)

    ok_dot = (
        (cls == DOT) & after_atomish & (depth == 0) & (pend == 0)
        & jnp.asarray(allow_dot)
    )

    ok_eos = (
        (cls == EOS) & after_atomish & (depth == 0) & (rings == 0) & (pend == 0)
    )

    allowed = ok_atom | ok_bond | ok_open | ok_close | ok_digit | ok_dot | ok_eos
    # An aromatic atom emitted with NO ring open must open a ring digit NOW:
    # OpenSMILES puts ring-bond digits directly after the atom (before
    # branches), and every aromatic atom must sit in a ring — either some
    # digit was open when it was emitted, or it is a ring opener itself.
    # Forcing DIGIT here prunes un-kekulisable strays like "cC" / "c(...)".
    must_ring = (last == ATOM) & (state.cur_arom[..., None] > 0) & (rings == 0)
    allowed = allowed & jnp.where(must_ring, cls == DIGIT, True)
    # Safety valve: if a beam paints itself into a corner (possible only via
    # the permissive approximations), fall back to EOS rather than NEG-inf
    # everything, which would poison the whole beam's log-probs.
    none_ok = ~jnp.any(allowed, axis=-1, keepdims=True)
    out = allowed | (none_ok & (cls == EOS))
    if return_forced:
        return out, none_ok[..., 0]
    return out


def update(state: GrammarState, tok: jax.Array) -> GrammarState:
    """Advance the grammar state by one sampled token (shape = state shape)."""
    cls = jnp.asarray(TOKEN_CLASS)[tok]
    cap = jnp.asarray(ATOM_CAPACITY)[tok]
    order = jnp.asarray(BOND_ORDER)[tok]
    dig = jnp.asarray(RING_DIGIT)[tok]
    eff = jnp.maximum(state.pending, 1)

    is_atom = cls == ATOM
    is_bond = cls == BOND
    is_open = cls == OPEN
    is_close = cls == CLOSE
    is_digit = cls == DIGIT
    is_dot = cls == DOT
    has_attach = state.cur_val > NONE_VAL // 2

    # ATOM: debit the previous attachment atom, become the new one.
    atom_cur = jnp.where(has_attach, cap - eff, cap)
    # DIGIT: debit the current atom by the (pending) closure order.
    digit_cur = state.cur_val - eff

    new_depth = state.depth + is_open.astype(jnp.int32) - is_close.astype(jnp.int32)
    bit = jnp.where(is_digit, 1 << jnp.maximum(dig - 1, 0), 0)
    new_rings = state.rings ^ bit

    push_idx = jnp.clip(state.depth, 0, MAX_DEPTH - 1)
    pop_idx = jnp.clip(state.depth - 1, 0, MAX_DEPTH - 1)
    # open and close are mutually exclusive: a pop always reads the pre-step
    # stack, and a push writes cur_val-1 (the branch consumes >=1 bond from
    # its attachment atom — permissive upper bound on post-branch valence).
    pushed = jnp.take_along_axis(state.stack, pop_idx[..., None], axis=-1)[..., 0]
    new_stack = jnp.where(
        is_open[..., None],
        _scatter_set(state.stack, push_idx, jnp.maximum(state.cur_val - 1, 0)),
        state.stack,
    )

    new_cur = jnp.where(is_atom, atom_cur, state.cur_val)
    new_cur = jnp.where(is_digit, digit_cur, new_cur)
    new_cur = jnp.where(is_close, pushed, new_cur)
    new_cur = jnp.where(is_dot, NONE_VAL, new_cur)

    new_pending = jnp.where(is_bond, order, 0)

    # attachment-atom identity (for the self-ring-closure rule): atoms take a
    # fresh id; '(' saves / ')' restores it alongside the valence stack.
    a_pushed = jnp.take_along_axis(state.astack, pop_idx[..., None], axis=-1)[..., 0]
    new_astack = jnp.where(
        is_open[..., None],
        _scatter_set(state.astack, push_idx, state.cur_atom),
        state.astack,
    )
    new_atom = jnp.where(is_atom, state.atom_n, state.cur_atom)
    new_atom = jnp.where(is_close, a_pushed, new_atom)
    new_atom = jnp.where(is_dot, -1, new_atom)
    new_atom_n = state.atom_n + is_atom.astype(jnp.int32)

    # record the opening atom of a freshly-opened ring digit
    opening = is_digit & ((state.rings & bit) == 0)
    slot = jax.nn.one_hot(jnp.clip(dig - 1, 0, 8), 9, dtype=jnp.int32)
    new_ring_atom = jnp.where(
        (opening[..., None] * slot) > 0,
        state.cur_atom[..., None],
        state.ring_atom,
    )

    # --- aromatic-ring feasibility tracking ---
    # cur_arom: 0 = not aromatic, 1 = aromatic (bracket/heteroatom),
    # 2 = plain 'c'. NOT saved through the branch stack: the only position
    # where a stale value could block (a ring closure after ')') requires an
    # explicit bond token in between, and pending != 0 already escapes the
    # aromatic-closure rule — every other stale read is on the permissive
    # side or unreachable (ok_digit excludes last == CLOSE).
    tok_arom = (jnp.asarray(IS_AROMATIC) + jnp.asarray(IS_PLAIN_C))[tok]
    new_cur_arom = jnp.where(is_atom, tok_arom, state.cur_arom)
    new_cur_arom = jnp.where(is_dot, 0, new_cur_arom)

    open_bits = (state.rings[..., None] >> jnp.arange(9)) & 1  # [..., 9] (pre-step)
    new_ring_cnt = state.ring_cnt + is_atom[..., None].astype(jnp.int32) * open_bits
    # branch/explicit-bond tokens make the chain inexact -> drop purity
    # (permissive); non-'c' atoms break the all-plain-c condition.
    impure = (is_open | is_bond)[..., None] | (
        is_atom[..., None] & (tok_arom[..., None] != 2)
    )
    new_ring_pure = state.ring_pure * (1 - impure.astype(jnp.int32))
    # freshly-opened digit: reset its slot from the opener atom
    fresh = (opening[..., None] * slot) > 0
    new_ring_cnt = jnp.where(fresh, 0, new_ring_cnt)
    new_ring_arom = jnp.where(
        fresh, (state.cur_arom > 0).astype(jnp.int32)[..., None], state.ring_arom
    )
    new_ring_pure = jnp.where(
        fresh, (state.cur_arom == 2).astype(jnp.int32)[..., None], new_ring_pure
    )

    return GrammarState(
        depth=new_depth,
        rings=new_rings,
        pending=new_pending,
        cur_val=new_cur,
        stack=new_stack,
        last=cls,
        cur_atom=new_atom,
        atom_n=new_atom_n,
        astack=new_astack,
        ring_atom=new_ring_atom,
        cur_arom=new_cur_arom,
        ring_cnt=new_ring_cnt,
        ring_arom=new_ring_arom,
        ring_pure=new_ring_pure,
    )


def _scatter_set(stack: jax.Array, idx: jax.Array, val: jax.Array) -> jax.Array:
    """stack[..., idx] = val with batched idx/val (one-hot write)."""
    onehot = jax.nn.one_hot(idx, stack.shape[-1], dtype=stack.dtype)
    return stack * (1 - onehot) + onehot * val[..., None]


def mask_logits(logp: jax.Array, state: GrammarState, neg: float = -1e9,
                allow_dot: bool = True) -> jax.Array:
    """Apply the grammar mask to log-probs (shape [..., V])."""
    return jnp.where(allowed_tokens(state, allow_dot=allow_dot), logp, neg)
