"""BEV-image autoencoders for encoder pretraining
(reference model/network.py:301-412: ImgDecoder, VAE_Conv, AE_Conv).

The pretrained encoder's params can be grafted into the policy's ``embed_img``
module (reference load_img_encoder :158-162, wired at train_HOPE_sac.py:160-162)
via :func:`graft_encoder_params`.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import NetConfig
from .policy import ImgEncoder, _act


class DeConvBlock(nn.Module):
    """transpose-conv + act + bilinear upsample + conv, with a residual
    shortcut (reference network.py:235-276)."""

    cout: int
    k: int
    upsample: int
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        act = jnp.tanh if self.use_tanh else nn.leaky_relu
        y = nn.ConvTranspose(self.cout, (self.k, self.k), padding="SAME")(x)
        y = act(y)
        y = jax.image.resize(y, (y.shape[0], self.upsample, self.upsample, y.shape[3]),
                             method="bilinear")
        y = nn.Conv(self.cout, (self.k, self.k), padding="SAME")(y)
        sc = nn.ConvTranspose(self.cout, (1, 1))(x)
        sc = jax.image.resize(sc, (sc.shape[0], self.upsample, self.upsample, sc.shape[3]),
                              method="bilinear")
        sc = nn.Conv(self.cout, (1, 1))(sc)
        return y + sc


class ImgDecoder(nn.Module):
    """fc stack -> deconv stack -> sigmoid image (reference :301-339)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        act = _act(cfg)
        chans = cfg.img_conv_channels
        _, h, w = cfg.img_shape
        base = h // (2 ** len(chans))
        x = z
        for s in reversed(cfg.img_fc_sizes):
            x = nn.Dense(s)(x)
            x = act(x)
        x = nn.Dense(base * base * chans[-1])(x)
        x = act(x)
        x = x.reshape(x.shape[0], base, base, chans[-1])
        up = base * 2
        for c in reversed(chans[:-1]):
            x = DeConvBlock(c, cfg.img_conv_kernel, up, cfg.use_tanh_activation)(x)
            up *= 2
        x = DeConvBlock(cfg.img_shape[0], cfg.img_conv_kernel, up,
                        cfg.use_tanh_activation)(x)
        x = nn.sigmoid(x)
        return jnp.transpose(x, (0, 3, 1, 2))        # NHWC -> CHW


class AEConv(nn.Module):
    """Deterministic conv autoencoder (reference AE_Conv :384-412)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, img_chw):
        mean, _ = ImgEncoder(self.cfg, name="encoder")(img_chw)
        return ImgDecoder(self.cfg, name="decoder")(mean)


class VAEConv(nn.Module):
    """Variational conv autoencoder (reference VAE_Conv :341-382)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, img_chw, key):
        mean, log_var = ImgEncoder(self.cfg, name="encoder")(img_chw)
        std = jnp.exp(0.5 * log_var)
        z = mean + std * jax.random.normal(key, std.shape)
        recon = ImgDecoder(self.cfg, name="decoder")(z)
        return recon, mean, log_var


def graft_encoder_params(policy_params: dict, ae_params: dict,
                         net_name: str = "embed_img") -> dict:
    """Replace the policy's image-encoder params with pretrained AE encoder
    params (reference load_img_encoder network.py:158-162).

    Matches by path *suffix* below the encoder module, so it grafts into both
    the actor tree (``params/embed_img/...``) and the critic tree
    (``params/net/embed_img/...``).  Raises if nothing was grafted (shape or
    naming drift would otherwise silently no-op).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(policy_params)
    ae_flat = flax.traverse_util.flatten_dict(ae_params)
    # AE encoder params keyed by their path suffix below the 'encoder' module
    enc = {k[k.index("encoder") + 1:]: v
           for k, v in ae_flat.items() if "encoder" in k}
    out = dict(flat)
    n = 0
    for k in flat:
        if net_name in k:
            suffix = k[k.index(net_name) + 1:]
            if suffix in enc:
                if out[k].shape != enc[suffix].shape:
                    raise ValueError(
                        f"graft shape mismatch at {k}: policy "
                        f"{out[k].shape} vs AE {enc[suffix].shape}")
                out[k] = enc[suffix]
                n += 1
    if n == 0:
        raise ValueError("graft_encoder_params matched no parameters")
    return flax.traverse_util.unflatten_dict(out)


def ae_loss(params, model: AEConv, imgs):
    recon = model.apply(params, imgs)
    return jnp.mean((recon - imgs) ** 2)


def vae_loss(params, model: VAEConv, imgs, key, beta: float = 1e-4):
    recon, mean, log_var = model.apply(params, imgs, key)
    rec = jnp.mean((recon - imgs) ** 2)
    kl = -0.5 * jnp.mean(1 + log_var - mean**2 - jnp.exp(log_var))
    return rec + beta * kl
