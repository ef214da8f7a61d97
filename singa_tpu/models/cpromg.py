"""CProMG-style conditional transformer: graph-attention pocket encoders +
property-prefixed autoregressive SMILES decoder.

Re-design of /root/reference/model/CProMG.py on fixed-shape padded batches.
The ragged-graph machinery (PyG knn_graph / to_undirected / get_laplacian /
to_dense_batch, CProMG.py:293-298) becomes masked static-shape ops; dense
attention runs in ``[B, T, C]`` layout straight on the MXU.

Deliberate deviations from the reference, documented here:
  * ``nn.Embedding(vocab, C, padding_idx=0)`` (CProMG.py:377) freezes the
    embedding of token id 0 ('#'), which is *not* the pad token ('^') — an
    apparent bug; we keep all embeddings trainable.
  * The decoder exposes a KV-cache path for O(T) incremental generation; the
    reference re-runs the full decoder per step (BeamSearch.py:81-83).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import DecoderConfig, EncoderConfig, ModelConfig
from singa_tpu.dtypes import compute_dtype
from singa_tpu.equivariant.layers import Linear
from singa_tpu.ops.knn import EdgeList, knn_graph
from singa_tpu.ops.laplacian import laplacian_edges
from singa_tpu.ops.segment import segment_softmax, segment_sum
from singa_tpu.ops.smearing import gaussian_smearing


def shifted_softplus(x: jax.Array) -> jax.Array:
    return jax.nn.softplus(x) - math.log(2.0)


class GroupedLinear(nn.Module):
    """Per-head block-diagonal projection — the reference's grouped 1x1 conv
    (CProMG.py:27-29)."""

    features: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        h = self.num_heads
        c_in = x.shape[-1] // h
        c_out = self.features // h
        bound = 1.0 / np.sqrt(c_in)
        w = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (h, c_in, c_out),
        )
        dt = compute_dtype()
        return jnp.einsum(
            "nhc,hco->nho", x.reshape(n, h, c_in).astype(dt), w.astype(dt)
        )


class EdgeMLP(nn.Module):
    """edge_channels -> hidden -> hidden with ShiftedSoftplus (CProMG.py:31-43)."""

    hidden: int

    @nn.compact
    def __call__(self, e: jax.Array) -> jax.Array:
        e = Linear(self.hidden)(e)
        e = shifted_softplus(e)
        return Linear(self.hidden)(e)


class GraphMHA(nn.Module):
    """Edge-conditioned multi-head graph attention (CProMG.py:19-78).

    Operates on flat node features [M, C] with a static EdgeList; messages
    aggregate to ``edges.src`` (the query node, 'target_to_source' flow).
    """

    hidden_channels: int
    key_channels: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        node_attr: jax.Array,  # [M, C]
        edges: EdgeList,
        edge_attr: jax.Array,  # [E, De]
    ) -> jax.Array:
        num_nodes = node_attr.shape[0]
        H = self.num_heads
        kd = self.key_channels // H
        vd = self.hidden_channels // H

        h_k = GroupedLinear(self.key_channels, H, name="k_lin")(node_attr)
        h_q = GroupedLinear(self.key_channels, H, name="q_lin")(node_attr)
        h_v = GroupedLinear(self.hidden_channels, H, name="v_lin")(node_attr)

        w_k = EdgeMLP(kd, name="weight_k_net")(edge_attr)  # [E, kd]
        keys = Linear(kd, name="weight_k_lin")(w_k[:, None, :] * h_k[edges.dst])
        queries = h_q[edges.src]
        qk = jnp.sum(queries * keys, axis=-1) / np.sqrt(kd)  # [E, H]
        alpha = segment_softmax(qk, edges.src, num_nodes, mask=edges.mask)

        w_v = EdgeMLP(vd, name="weight_v_net")(edge_attr)
        msg = Linear(vd, name="weight_v_lin")(w_v[:, None, :] * h_v[edges.dst])
        msg = msg * alpha[..., None]
        aggr = segment_sum(msg, edges.src, num_nodes, mask=edges.mask)
        aggr = aggr.reshape(num_nodes, -1)

        out = Linear(self.hidden_channels, name="centroid_lin")(node_attr) + aggr
        out = Linear(self.hidden_channels, name="out_transform")(
            shifted_softplus(out)
        )
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out)


class DenseMHA(nn.Module):
    """Standard dense attention with residual + post-LN (CProMG.py:81-158).

    ``decode=True`` enables incremental decoding with a flax 'cache'
    collection: the query is one new position; keys/values accumulate in a
    fixed-size ring written at ``cache_index`` — the KV-cache path the
    reference lacks (BeamSearch.py re-runs the full decoder per token)."""

    hidden_channels: int
    key_channels: int
    num_heads: int
    max_decode_len: int = 0  # cache capacity when decode=True

    @nn.compact
    def __call__(
        self,
        q: jax.Array,  # [B, Tq, C]
        kv: jax.Array,  # [B, Tk, C]
        mask: Optional[jax.Array],  # [B, Tq, Tk] bool, True = blocked
        decode: bool = False,
    ) -> jax.Array:
        B, Tq, C = q.shape
        H = self.num_heads
        kd = self.key_channels // H
        vd = self.hidden_channels // H
        residual = q

        qs = Linear(self.key_channels, name="W_Q")(q).reshape(B, Tq, H, kd)
        ks = Linear(self.key_channels, name="W_K")(kv).reshape(B, -1, H, kd)
        vs = Linear(self.hidden_channels, name="W_V")(kv).reshape(B, -1, H, vd)

        if decode:
            T = self.max_decode_len
            assert T > 0, "max_decode_len required for decode mode"
            ck = self.variable(
                "cache", "cached_key", jnp.zeros, (B, T, H, kd), ks.dtype
            )
            cv = self.variable(
                "cache", "cached_value", jnp.zeros, (B, T, H, vd), vs.dtype
            )
            ci = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            idx = ci.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, ks, (0, idx, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, vs, (0, idx, 0, 0))
            ci.value = idx + ks.shape[1]
            ks, vs = ck.value, cv.value
            scores = jnp.einsum("bqhd,bkhd->bhqk", qs, ks) / np.sqrt(kd)
            valid = jnp.arange(T) < (idx + qs.shape[1])
            scores = jnp.where(valid[None, None, None, :], scores, -1e9)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", qs, ks) / np.sqrt(kd)
            if mask is not None:
                scores = jnp.where(mask[:, None, :, :], -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vs).reshape(B, Tq, -1)
        out = Linear(self.hidden_channels, name="linear")(ctx)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)


class PositionwiseFFN(nn.Module):
    """1x1-conv FFN with residual + post-LN (CProMG.py:161-191)."""

    hidden_channels: int
    ffn_hidden: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = jax.nn.relu(Linear(self.ffn_hidden, name="conv1")(x))
        h = Linear(self.hidden_channels, name="conv2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h + residual)


def sinusoidal_pe(length: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    position = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe, dtype)


def _build_graph(pos, mask, k, smear_stop, edge_channels):
    """kNN -> undirected mean-length -> Gaussian smear -> Laplacian transform
    (CProMG.py:293-298). Returns (edges, edge_attr) over B*N global nodes."""
    B, N, _ = pos.shape
    edges = knn_graph(pos, mask, k, undirected=True)
    flat = pos.reshape(-1, 3)
    d = jnp.linalg.norm(flat[edges.src] - flat[edges.dst], axis=-1)
    attr = gaussian_smearing(d, 0.0, smear_stop, edge_channels)
    attr = jnp.where(edges.mask[:, None], attr, 0.0)
    edges, attr = laplacian_edges(edges, attr, B * N)
    # self-loops on padded nodes are already inert: their degree weight is 0.
    return edges, attr


class EncoderLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, node_attr, edges, edge_attr):
        msa = GraphMHA(
            self.cfg.hidden_channels,
            self.cfg.key_channels,
            self.cfg.num_heads,
            name="enc_self_attn",
        )(node_attr, edges, edge_attr)
        ffn = PositionwiseFFN(self.cfg.hidden_channels, self.cfg.ffn_hidden, name="pos_ffn")(msa)
        return msa, ffn


class _ScanEncoderLayer(nn.Module):
    """nn.scan body: carry = node features, collect = per-layer MSA output
    (consumed by Encoder2's cross-attention at layers 2 and 5)."""

    cfg: EncoderConfig
    smear_stop: float

    @nn.compact
    def __call__(self, x, g):
        if self.cfg.attn_form == "neighbor":
            from singa_tpu.models.neighbor_graph import NeighborEncoderLayer

            layer_cls = NeighborEncoderLayer
        else:
            from singa_tpu.models.dense_graph import DenseEncoderLayer

            layer_cls = DenseEncoderLayer
        msa, y = layer_cls(self.cfg, self.smear_stop, name="layer")(x, g)
        # LayerNorm promotes to f32; without the cast layers 1..5 silently ran
        # in f32 (and scan requires a dtype-stable carry)
        return y.astype(x.dtype), msa.astype(x.dtype)


class Encoder(nn.Module):
    """Pocket-atom encoder (CProMG.py:276-309), dense-attention form.

    A neighbor-list gather form (models/neighbor_graph.py) is parameter-
    compatible and parity-tested, but measured ~2.2x SLOWER end-to-end on
    this chip: XLA row-gathers (take_along_axis over [B, N, K] lists) ran at
    ~2.6 GB/s and the 3-factor score/aggregate contractions materialised the
    [B, N, K, H, d] intermediate anyway. Dense masked [B, N, N] einsums
    remain the fastest form at N<=448."""

    cfg: EncoderConfig
    feature_dim: int

    @nn.compact
    def __call__(self, feat, pos, mask, lap_pe):
        B, N, _ = feat.shape
        x = Linear(self.cfg.hidden_channels, name="protein_atom_emb")(feat)
        x = x + Linear(self.cfg.hidden_channels, name="laplacian_emb")(lap_pe)
        if self.cfg.attn_form == "neighbor":
            from singa_tpu.models.neighbor_graph import _dense_attn, build_neighbor_graph

            g = build_neighbor_graph(
                pos, mask, self.cfg.knn, self.cfg.smear_stop, self.cfg.edge_channels,
                with_adj_dist=_dense_attn(),
            )
        else:
            from singa_tpu.models.dense_graph import build_dense_graph

            g = build_dense_graph(
                pos, mask, self.cfg.knn, self.cfg.smear_stop, self.cfg.edge_channels
            )
        # layers run under nn.scan: XLA otherwise overlaps the rematerialised
        # backward of several layers, keeping multiple [B, N, N, kd] edge
        # tensors live at once (the batch-64 OOM); scan serialises them and
        # compiles the layer body once.
        # Remat is config-driven (cfg.remat='auto' remats only the dense
        # form): the neighbor form's saved per-layer residuals are ~450 MB
        # scan stacks at batch 64 — the difference between fitting batch 64
        # monolithically (remat on) and a ~2% faster batch-32 step (off).
        use_remat = (
            self.cfg.attn_form != "neighbor"
            if self.cfg.remat == "auto"
            else self.cfg.remat == "on"
        )
        body = nn.remat(_ScanEncoderLayer) if use_remat else _ScanEncoderLayer
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.cfg.num_interactions,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        x, msas = scan(self.cfg, self.cfg.smear_stop, name="layers")(x, g)
        msa_outputs = [msas[i] for i in range(self.cfg.num_interactions)]
        out = x * mask[..., None]
        pad_mask = ~mask[:, None, :]  # [B, 1, N], True = blocked
        return out, pad_mask, msa_outputs


class Encoder2(nn.Module):
    """Second encoder with cross-attention into encoder-1 MSA outputs at
    layers 2 and 5 (CProMG.py:313-343; during training it consumes the
    *ligand* equivariant features, GAN.py:74-77). Dense-attention form."""

    cfg: EncoderConfig
    feature_dim: int

    @nn.compact
    def __call__(self, feat, pos, mask, lap_pe, atom_pad_mask, atom_msa_outputs):
        from singa_tpu.models.dense_graph import DenseGraphMHA, build_dense_graph

        B, N, _ = feat.shape
        x = Linear(self.cfg.hidden_channels, name="aa_emb")(feat)
        x = x + Linear(self.cfg.hidden_channels, name="laplacian_emb")(lap_pe)
        g = build_dense_graph(
            pos, mask, self.cfg.knn_aa, self.cfg.smear_stop_aa, self.cfg.edge_channels
        )
        for i in range(self.cfg.num_interactions):
            msa = DenseGraphMHA(
                self.cfg.hidden_channels,
                self.cfg.key_channels,
                self.cfg.num_heads,
                self.cfg.edge_channels,
                self.cfg.smear_stop_aa,
                name=f"layer_{i}_attn",
            )(x, g)
            if i in (2, 5):
                proj = Linear(self.cfg.hidden_channels, name=f"layer_{i}_proj")(
                    atom_msa_outputs[i]
                )
                cross_mask = jnp.broadcast_to(
                    atom_pad_mask, (B, N, atom_pad_mask.shape[-1])
                )
                cross = DenseMHA(
                    self.cfg.hidden_channels,
                    self.cfg.key_channels,
                    self.cfg.num_heads,
                    name=f"layer_{i}_cross",
                )(msa, proj, cross_mask)
                cross = cross * mask[..., None]
                msa = nn.LayerNorm(epsilon=1e-5, name=f"layer_{i}_norm")(msa + cross)
            x = PositionwiseFFN(
                self.cfg.hidden_channels, self.cfg.ffn_hidden, name=f"layer_{i}_ffn"
            )(msa)
        out = x * mask[..., None]
        return out, ~mask[:, None, :]


class DecoderLayer(nn.Module):
    cfg: DecoderConfig

    def setup(self):
        self.dec_self_attn = DenseMHA(
            self.cfg.hidden_channels, self.cfg.key_channels, self.cfg.num_heads,
            max_decode_len=self.cfg.tgt_len + 1,
        )
        self.dec_enc_attn = DenseMHA(
            self.cfg.hidden_channels, self.cfg.key_channels, self.cfg.num_heads
        )
        self.pos_ffn = PositionwiseFFN(self.cfg.hidden_channels, self.cfg.ffn_hidden)

    def __call__(self, x, enc, self_mask, cross_mask, decode: bool = False):
        x = self.dec_self_attn(x, x, self_mask, decode=decode)
        x = self.dec_enc_attn(x, enc, cross_mask)
        return self.pos_ffn(x)


class Decoder(nn.Module):
    """Property-prefixed causal SMILES decoder (CProMG.py:371-423).

    Supports teacher-forced full sequences (``__call__``) and incremental
    KV-cached decoding (``prime`` + ``decode_token``)."""

    cfg: DecoderConfig
    num_props: int
    pad_token: int

    def setup(self):
        C = self.cfg.hidden_channels
        self.mol_emb = nn.Embed(
            self.cfg.vocab_size, C, dtype=compute_dtype(),
            embedding_init=nn.initializers.normal(1.0),
        )
        self.type_emb = nn.Embed(
            2, C, dtype=compute_dtype(),
            embedding_init=nn.initializers.normal(1.0),
        )
        if self.num_props:
            self.prop_nn = Linear(C)
        self.layers = [
            DecoderLayer(self.cfg, name=f"layer_{i}")
            for i in range(self.cfg.num_interactions)
        ]

    def __call__(
        self,
        tokens: jax.Array,  # [B, T]
        enc: jax.Array,  # [B, S, C]
        enc_pad_mask: jax.Array,  # [B, 1, S]
        prop: Optional[jax.Array],  # [B, P]
    ) -> jax.Array:
        B, T = tokens.shape
        C = self.cfg.hidden_channels
        x = self.mol_emb(tokens)
        x = x + sinusoidal_pe(T, C, x.dtype)[None]

        if self.num_props:
            x = x + self.type_emb(jnp.ones((B, T), jnp.int32))
            p = self.prop_nn(prop.astype(x.dtype))[:, None, :]
            p = p + self.type_emb(jnp.zeros((B, 1), jnp.int32))
            x = jnp.concatenate([p, x], axis=1)
            # the property slot is never a pad key
            key_is_pad = jnp.concatenate(
                [jnp.zeros((B, 1), bool), tokens == self.pad_token], axis=1
            )
        else:
            key_is_pad = tokens == self.pad_token

        Tp = x.shape[1]
        causal = jnp.triu(jnp.ones((Tp, Tp), bool), k=1)
        self_mask = causal[None] | key_is_pad[:, None, :]
        cross_mask = jnp.broadcast_to(enc_pad_mask, (B, Tp, enc_pad_mask.shape[-1]))

        for layer in self.layers:
            x = layer(x, enc, self_mask, cross_mask)
        return x

    def prime(self, enc, enc_pad_mask, prop):
        """Initialise the KV cache with the property-prefix position."""
        B = enc.shape[0]
        if self.num_props:
            p = self.prop_nn(prop.astype(enc.dtype))[:, None, :]
            p = p + self.type_emb(jnp.zeros((B, 1), jnp.int32))
            x = p
        else:
            # no prefix: nothing to prime; write nothing by passing zero-length
            x = jnp.zeros((B, 0, self.cfg.hidden_channels), enc.dtype)
            return x
        cross_mask = jnp.broadcast_to(enc_pad_mask, (B, 1, enc_pad_mask.shape[-1]))
        for layer in self.layers:
            x = layer(x, enc, None, cross_mask, decode=True)
        return x

    def decode_token(self, token, pos, enc, enc_pad_mask):
        """One decode step: ``token [B, 1]`` at sequence position ``pos``."""
        B = token.shape[0]
        C = self.cfg.hidden_channels
        pe = sinusoidal_pe(self.cfg.tgt_len, C)
        x = self.mol_emb(token)
        x = x + jax.lax.dynamic_slice_in_dim(pe, pos, 1, axis=0)[None].astype(x.dtype)
        if self.num_props:
            x = x + self.type_emb(jnp.ones((B, 1), jnp.int32))
        cross_mask = jnp.broadcast_to(enc_pad_mask, (B, 1, enc_pad_mask.shape[-1]))
        for layer in self.layers:
            x = layer(x, enc, None, cross_mask, decode=True)
        return x


class CProMGTransformer(nn.Module):
    """Encoder ‖ Encoder2 -> Decoder -> vocab projection (CProMG.py:426-464)."""

    cfg: ModelConfig
    pad_token: int

    def setup(self):
        self.encoder = Encoder(self.cfg.encoder, self.cfg.featurizer_feat_dim)
        self.encoder2 = Encoder2(self.cfg.encoder, self.cfg.featurizer_feat_dim)
        self.decoder = Decoder(self.cfg.decoder, self.cfg.num_props, self.pad_token)
        self.projection = Linear(self.cfg.decoder.vocab_size, use_bias=False)

    def encode(self, protein_feat, protein_pos, protein_mask, protein_lap):
        return self.encoder(protein_feat, protein_pos, protein_mask, protein_lap)

    def decode(self, tokens, enc, enc_pad_mask, prop):
        """Decoder + projection; property position stripped. [B, T, V]."""
        dec = self.decoder(tokens, enc, enc_pad_mask, prop)
        logits = self.projection(dec)
        if self.cfg.num_props:
            logits = logits[:, 1:, :]
        return logits

    def prime_cache(self, enc, enc_pad_mask, prop):
        return self.decoder.prime(enc, enc_pad_mask, prop)

    def decode_token(self, token, pos, enc, enc_pad_mask):
        """KV-cached single-token decode -> next-token logits [B, V]."""
        dec = self.decoder.decode_token(token, pos, enc, enc_pad_mask)
        return self.projection(dec)[:, 0, :]

    def __call__(
        self,
        protein_feat, protein_pos, protein_mask, protein_lap,
        tokens,
        ligand_feat, ligand_pos, ligand_mask, ligand_lap,
        prop: Optional[jax.Array],
    ) -> jax.Array:
        enc1, pad1, msa = self.encoder(protein_feat, protein_pos, protein_mask, protein_lap)
        enc2, pad2 = self.encoder2(ligand_feat, ligand_pos, ligand_mask, ligand_lap, pad1, msa)
        enc = jnp.concatenate([enc1, enc2], axis=1)
        pad = jnp.concatenate([pad1, pad2], axis=2)
        return self.decode(tokens, enc, pad, prop)  # [B, T, V]
