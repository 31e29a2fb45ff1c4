"""Multi-modal observation-fusion network (reference model/network.py).

Per-modality MLP embeddings to a shared width, fused as tokens through the
transformer encoder (or concatenated through an MLP trunk), with the conv
BEV-image encoder.  The critic variant consumes the action as one more token
(reference sac_agent.SACCriticAdapter :15-30).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import NetConfig
from .attention import ORTHO, AttentionFusion


def _act(cfg: NetConfig):
    return jnp.tanh if cfg.use_tanh_activation else nn.leaky_relu


class EmbedMLP(nn.Module):
    """n_embed_layers-deep MLP to embed_dim (reference network.py:69-88)."""

    cfg: NetConfig
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = _act(cfg)
        x = nn.Dense(cfg.embed_dim, kernel_init=ORTHO)(x)
        for _ in range(cfg.n_embed_layers - 1):
            x = act(x)
            x = nn.Dense(cfg.embed_dim, kernel_init=ORTHO)(x)
        return x


class ConvBlock(nn.Module):
    """conv-act-maxpool with a conv1x1+avgpool residual shortcut
    (reference network.py:198-233)."""

    cout: int
    k: int
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        act = jnp.tanh if self.use_tanh else nn.leaky_relu
        y = nn.Conv(self.cout, (self.k, self.k), padding="SAME")(x)
        y = act(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        sc = nn.Conv(self.cout, (1, 1))(x)
        sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        return y + sc


class ImgEncoder(nn.Module):
    """Conv stack -> fc -> (mean, std) heads (reference network.py:278-299);
    the fusion net consumes the mean head."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, img_chw):
        cfg = self.cfg
        act = _act(cfg)
        x = jnp.transpose(img_chw, (0, 2, 3, 1))     # CHW -> NHWC
        for c in cfg.img_conv_channels:
            x = ConvBlock(c, cfg.img_conv_kernel, cfg.use_tanh_activation)(x)
        x = x.reshape(x.shape[0], -1)
        for h in cfg.img_fc_sizes:
            x = nn.Dense(h)(x)
            x = act(x)
        mean = nn.Dense(cfg.embed_dim)(x)
        std = nn.Dense(cfg.embed_dim)(x)
        return mean, std


class MLPFusion(nn.Module):
    """Concat trunk used when attention is disabled (reference network.py:44-54)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        act = _act(cfg)
        x = tokens.reshape(tokens.shape[0], -1)
        if cfg.n_hidden_layers == 1:
            return nn.Dense(cfg.output_dim, kernel_init=ORTHO)(x)
        x = nn.Dense(cfg.hidden_dim, kernel_init=ORTHO)(x)
        for _ in range(cfg.n_hidden_layers - 2):
            x = act(x)
            x = nn.Dense(cfg.hidden_dim, kernel_init=ORTHO)(x)
        return nn.Dense(cfg.output_dim, kernel_init=ORTHO)(x)


class MultiObsEmbedding(nn.Module):
    """The fusion network (reference MultiObsEmbedding :34-196).

    Call with an obs dict: lidar (B, 120), target (B, 5), optional
    action_mask (B, 42), img (B, 3, H, W), action (B, 2).
    """

    cfg: NetConfig

    @nn.compact
    def __call__(self, obs: dict):
        cfg = self.cfg
        act = _act(cfg)
        tokens = [
            EmbedMLP(cfg, name="embed_lidar")(obs["lidar"]),
            EmbedMLP(cfg, name="embed_tgt")(obs["target"]),
        ]
        if cfg.action_mask_dim:
            tokens.append(EmbedMLP(cfg, name="embed_am")(obs["action_mask"]))
        if cfg.img_shape is not None:
            mean, _ = ImgEncoder(cfg, name="embed_img")(obs["img"])
            x = act(mean)
            x = nn.Dense(cfg.embed_dim, kernel_init=ORTHO, name="re_embed_img")(x)
            tokens.append(x)
        if cfg.action_input_dim:
            tokens.append(EmbedMLP(cfg, name="embed_action")(obs["action"]))

        stacked = jnp.stack(tokens, axis=1)          # (B, n_modal, embed)
        if cfg.attention is not None:
            a = cfg.attention
            out = AttentionFusion(cfg.embed_dim, a.depth, a.heads, a.dim_head,
                                  a.mlp_dim, a.hidden_dim, cfg.output_dim,
                                  name="fusion")(stacked)
        else:
            out = MLPFusion(cfg, name="fusion")(stacked)
        if cfg.use_tanh_output:
            out = jnp.tanh(out)
        return out


class Critic(nn.Module):
    """Q(s, a): fusion net with the action as an extra modality
    (reference SACCriticAdapter)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, obs: dict, action):
        merged = dict(obs)
        merged["action"] = action
        return MultiObsEmbedding(self.cfg, name="net")(merged)
