"""Model zoo: the reference's research-sandbox nets as Flax modules
(SURVEY.md §2.3, nets.py beyond the two production models).

All NHWC, torch-default init, jit/pjit-ready. The two production nets
live in critic.py / decoder.py; everything here is the legacy/ablation
family: usable, tested for shapes, and convertible from torch where a
reference checkpoint layout exists.

Implementation notes:
  * `VAE`: the reference's class is unconstructible due to the
    `nn.Lineanetsr` typo (nets.py:78) — ours is the working version of
    the evident intent (documented deviation).
  * stride-2 ConvTranspose layers use SAME padding (flax) which
    matches torch's k=4,s=2,p=1 output geometry; the 4x4 stride-1
    bottleneck transposes are exact (VALID).
  * torchvision-pretrained backbones (VGG11 / ResNet18,
    nets.py:704-804) are implemented as native flax modules with
    state-dict converters; pretrained weights load from a user-supplied
    torchvision checkpoint (no network access is assumed).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.core.init import (
    make_torch_bias_init, make_torch_convT_bias_init, torch_kernel_init,
    torch_convT_kernel_init,
)
from cgs_tpu.models.decoder import upsample2x

Array = jnp.ndarray


def _conv(features, kernel, stride, padding, in_ch, name=None):
    kshape = (kernel, kernel, in_ch, features)
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=padding, kernel_init=torch_kernel_init,
                   bias_init=make_torch_bias_init(kshape), name=name)


def _dense(features, in_ch, name=None):
    return nn.Dense(features, kernel_init=torch_kernel_init,
                    bias_init=make_torch_bias_init((in_ch, features)),
                    name=name)


def _convT(features, kernel, stride, padding, in_ch, name=None):
    # torch ConvTranspose2d weight is (in, out, kh, kw) and its
    # default init takes fan_in = weight.size(1) * kh * kw =
    # OUT_ch * k^2 (not in_ch like Conv2d) — verified empirically:
    # nn.ConvTranspose2d(32, 16, 4) draws |w| <= 1/sqrt(16*16)
    return nn.ConvTranspose(features, (kernel, kernel),
                            (stride, stride), padding=padding,
                            kernel_init=torch_convT_kernel_init,
                            bias_init=make_torch_convT_bias_init(
                                (kernel, kernel, in_ch, features)),
                            name=name)


class LegacyCritic(nn.Module):
    """The pre-NewCritic conv critic (nets.py:133-157): 4 conv blocks
    (pool or stride-2) then a 4x4 conv to 1 channel; raw output."""
    chfak: int = 1
    colorchs: int = 3
    pool: str = "max"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        stride = 1 if self.pool == "max" else 2
        dims = (8, 8, 8, 16)
        in_ch = self.colorchs
        for i, d in enumerate(dims):
            d *= self.chfak
            x = _conv(d, 3, stride, "SAME", in_ch, f"conv{i}")(x)
            x = nn.relu(x)
            if self.pool == "max":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            in_ch = d
        x = _conv(1, 4, 1, "VALID", in_ch, "head")(x)
        return x


class SmallCritic(nn.Module):
    """nets.py:315-335: two stride-2 convs + 4x4 head on 16x16."""
    chfak: int = 1
    colorchs: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _conv(8 * self.chfak, 3, 2, "SAME", self.colorchs,
                  "conv0")(x)
        x = nn.relu(x)
        x = _conv(16 * self.chfak, 3, 2, "SAME", 8 * self.chfak,
                  "conv1")(x)
        x = nn.relu(x)
        return _conv(1, 4, 1, "VALID", 16 * self.chfak, "head")(x)


class NoScaleCritic(nn.Module):
    """nets.py:338-353: stride-1 convs, no downsampling, 4x4 head."""
    chfak: int = 1
    colorchs: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _conv(64 * self.chfak, 3, 1, "SAME", self.colorchs,
                  "conv0")(x)
        x = nn.relu(x)
        x = _conv(16 * self.chfak, 3, 1, "SAME", 64 * self.chfak,
                  "conv1")(x)
        x = nn.relu(x)
        return _conv(1, 4, 1, "VALID", 16 * self.chfak, "head")(x)


class AutoEncoder(nn.Module):
    """MLP autoencoder (nets.py:19-47): 32-16-enc_dim tanh stack;
    returns (recon_logits, enc). Train with
    optax + sigmoid-BCE like the reference's built-in train_batch."""
    width: int = 64
    enc_dim: int = 1
    colorchs: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        shape = x.shape
        flat = self.width * self.width * self.colorchs
        h = x.reshape((x.shape[0], -1))
        h = nn.tanh(_dense(32, flat, "enc0")(h))
        h = nn.tanh(_dense(16, 32, "enc1")(h))
        enc = nn.tanh(_dense(self.enc_dim, 16, "enc2")(h))
        h = nn.tanh(_dense(16, self.enc_dim, "dec0")(enc))
        h = nn.tanh(_dense(32, 16, "dec1")(h))
        out = _dense(flat, 32, "dec2")(h)
        return out.reshape(shape), enc


class VAE(nn.Module):
    """MLP VAE (nets.py:69-103; reference class crashes on the
    `nn.Lineanetsr` typo at nets.py:78 — this is the working intent).
    Returns (recon_logits, mean, log_std)."""
    width: int = 64
    enc_dim: int = 8
    colorchs: int = 3

    @nn.compact
    def __call__(self, x: Array, key=None, deterministic: bool = False):
        shape = x.shape
        flat = self.width * self.width * self.colorchs
        h = x.reshape((x.shape[0], -1))
        h = nn.relu(_dense(32, flat, "enc0")(h))
        h = nn.relu(_dense(16, 32, "enc1")(h))
        stats = _dense(self.enc_dim * 2, 16, "enc2")(h)
        mean = stats[:, : self.enc_dim]
        log_std = stats[:, self.enc_dim:]
        if deterministic:
            sample = mean
        elif key is None:
            # the reference ALWAYS rsamples (nets.py:98-99) — a silent
            # sample=mean fallback would train a plain autoencoder
            # with an inert KL term; the mean path is eval-only and
            # must be asked for by name
            raise ValueError(
                "VAE needs a PRNG key for the reparameterized sample "
                "(pass deterministic=True for the eval-time mean path)")
        else:  # reparameterized sample (nets.py:98-99)
            sample = mean + jnp.exp(log_std) * jax.random.normal(
                key, mean.shape)
        h = nn.relu(_dense(16, self.enc_dim, "dec0")(sample))
        h = nn.relu(_dense(32, 16, "dec1")(h))
        out = _dense(flat, 32, "dec2")(h)
        return out.reshape(shape), mean, log_std


def vae_loss(recon_logits, target, mean, log_std):
    """BCE-with-logits (sum) + KL (nets.py:111-117)."""
    bce = jnp.sum(
        jnp.maximum(recon_logits, 0) - recon_logits * target +
        jnp.log1p(jnp.exp(-jnp.abs(recon_logits))))
    kl = -0.5 * jnp.sum(1 + log_std - mean ** 2 - jnp.exp(log_std))
    return bce + kl


class ConvEncoder64x64(nn.Module):
    """Generic 64x64 conv encoder (nets.py:223-257): 4 conv+pool
    blocks -> 4x4 conv -> tanh (1x1 spatial). embed=True additionally
    returns all post-activation maps upsampled to 64x64 and
    channel-concatenated."""
    pooling: str = "max"
    enc_dim: int = 1
    in_chs: int = 3
    chfak: int = 1

    @nn.compact
    def __call__(self, x: Array, embed: bool = False):
        dims = (8, 8, 16, 16)
        stride = 1 if self.pooling in ("max", "avg") else 2
        embeds: List[Array] = []

        def collect(h):
            if embed:
                embeds.append(jax.image.resize(
                    h, (h.shape[0], 64, 64, h.shape[-1]), "nearest"))

        in_ch = self.in_chs
        for i, d in enumerate(dims):
            d *= self.chfak
            x = _conv(d, 3, stride, "SAME", in_ch, f"conv{i}")(x)
            x = nn.relu(x)
            collect(x)
            if self.pooling == "max":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif self.pooling == "avg":
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            in_ch = d
        x = _conv(self.enc_dim, 4, 1, "VALID", in_ch, "neck")(x)
        x = nn.tanh(x)
        collect(x)
        if embed:
            return x, jnp.concatenate(embeds, axis=-1)
        return x


class ConvDecoder64x64(nn.Module):
    """nets.py:260-285: x4 upsample then 4 conv+x2-upsample stages."""
    enc_dim: int = 1
    out_chs: int = 3
    chfak: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample2x(upsample2x(x))  # x4 (nets.py:267)
        in_ch = self.enc_dim
        for i in range(4):
            d = 8 * self.chfak
            x = _conv(d, 3, 1, "SAME", in_ch, f"conv{i}")(x)
            x = nn.relu(x)
            x = upsample2x(x)
            in_ch = d
        return _conv(self.out_chs, 3, 1, "SAME", in_ch, "out")(x)


class PolicyNet(nn.Module):
    """MineRL agent remnant (nets.py:288-312): encoder -> linear ->
    tanh logits; `greedy_action` mirrors get_action's argmax."""
    enc_dim: int = 64
    in_chs: int = 6
    out_chs: int = 64
    chfak: int = 1

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        enc = ConvEncoder64x64(enc_dim=self.enc_dim, in_chs=self.in_chs,
                               chfak=self.chfak, name="encoder")(obs)
        h = nn.relu(enc).reshape((obs.shape[0], -1))
        return nn.tanh(_dense(self.out_chs, self.enc_dim, "head")(h))

    @staticmethod
    def greedy_action(logits: Array) -> Array:
        return jnp.argmax(logits, axis=-1)


class Unet(nn.Module):
    """Full encoder+decoder U-Net with built-in critic head
    (nets.py:356-449) — predecessor of the split NewCritic/UnetDecoder
    design; used throughout TrainHandler. LeakyReLU(0.2) activations.

    forward(X, critic=True) -> critic score from the bottleneck;
    otherwise the sigmoid mask (and u0 features with embeds=True).
    Faithfully reproduces the upsample-path quirk of feeding
    cat(ups(u0), ups(u0)) to the final conv (nets.py:437)."""
    edims: Sequence[int] = (8, 8, 8, 16)
    ddims: Sequence[int] = (8, 8, 8, 16)
    bottleneck: int = 32
    colorchs: int = 3
    chfak: int = 1

    @nn.compact
    def __call__(self, x: Array, critic: bool = False,
                 embeds: bool = False):
        e = tuple(d * self.chfak for d in self.edims)
        dd = tuple(d * self.chfak for d in self.ddims)
        acti = lambda h: nn.leaky_relu(h, 0.2)  # noqa: E731

        x0 = acti(_conv(e[0], 3, 1, "SAME", self.colorchs, "enc0")(x))
        p0 = nn.max_pool(x0, (2, 2), strides=(2, 2))
        x1 = acti(_conv(e[1], 3, 1, "SAME", e[0], "enc1")(p0))
        p1 = nn.max_pool(x1, (2, 2), strides=(2, 2))
        x2 = acti(_conv(e[2], 3, 1, "SAME", e[1], "enc2")(p1))
        p2 = nn.max_pool(x2, (2, 2), strides=(2, 2))
        x3 = acti(_conv(e[3], 3, 1, "SAME", e[2], "enc3")(p2))
        p3 = nn.max_pool(x3, (2, 2), strides=(2, 2))
        x4 = acti(_conv(self.bottleneck, 4, 1, "VALID", e[3],
                        "enc4")(p3))

        # critic head (nets.py:390-397,422-423). Both heads are always
        # traced so the param tree is branch-independent (init under
        # either flag yields the FULL tree); XLA dead-code eliminates
        # whichever output is unused under jit.
        h = x4.reshape((x4.shape[0], -1))
        h = nn.relu(_dense(32, self.bottleneck, "crit0")(h))
        score = _dense(1, 32, "crit1")(h)
        if critic and not self.is_initializing():
            # eager critic calls skip the dead decoder compute; init
            # still traces it so the param tree stays branch-free
            return score

        u3 = acti(_convT(dd[3], 4, 1, "VALID", self.bottleneck,
                         "dec4")(x4))
        u2 = acti(_conv(dd[2], 3, 1, "SAME", e[3] + dd[3], "dec3")(
            jnp.concatenate([upsample2x(u3), x3], axis=-1)))
        u1 = acti(_conv(dd[1], 3, 1, "SAME", e[2] + dd[2], "dec2")(
            jnp.concatenate([upsample2x(u2), x2], axis=-1)))
        u0 = acti(_conv(dd[0], 3, 1, "SAME", e[1] + dd[1], "dec1")(
            jnp.concatenate([upsample2x(u1), x1], axis=-1)))
        up0 = upsample2x(u0)
        y = nn.sigmoid(_conv(1, 3, 1, "SAME", e[0] + dd[0], "dec0")(
            jnp.concatenate([up0, up0], axis=-1)))  # quirk nets.py:437
        if critic:
            return score
        return (y, u0) if embeds else y


class SmallUnet(nn.Module):
    """3-level U-Net (nets.py:526-561)."""
    edims: Sequence[int] = (8, 8, 16)
    ddims: Sequence[int] = (8, 8, 16)
    colorchs: int = 3
    chfak: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        e = tuple(d * self.chfak for d in self.edims)
        dd = tuple(d * self.chfak for d in self.ddims)
        x0 = nn.relu(_conv(e[0], 3, 1, "SAME", self.colorchs,
                           "enc0")(x))
        x1 = nn.relu(_conv(e[1], 3, 1, "SAME", e[0], "enc1")(
            nn.max_pool(x0, (2, 2), strides=(2, 2))))
        x2 = nn.relu(_conv(e[2], 4, 1, "VALID", e[1], "enc2")(
            nn.max_pool(x1, (2, 2), strides=(2, 2))))
        u1 = nn.relu(_convT(dd[1], 4, 1, "VALID", dd[2], "dec2")(x2))
        u0 = nn.relu(_conv(dd[0], 3, 1, "SAME", e[1] + dd[1], "dec1")(
            jnp.concatenate([upsample2x(u1), x1], axis=-1)))
        return nn.sigmoid(_conv(1, 3, 1, "SAME", e[0] + dd[0],
                                "dec0")(
            jnp.concatenate([upsample2x(u0), x0], axis=-1)))


class GroundedUnet(nn.Module):
    """U-Net with RGB re-grounding at every encoder scale
    (nets.py:646-701): the downsampled input is concatenated before
    encoder convs 1-3; bilinear downscaling."""
    edims: Sequence[int] = (8, 8, 8, 16, 32)
    ddims: Sequence[int] = (8, 8, 8, 16, 32)
    colorchs: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        e, dd = self.edims, self.ddims
        acti = nn.relu

        def down(h):
            # antialias=False matches the reference's
            # F.interpolate(scale_factor=0.5, mode='bilinear',
            # align_corners=False) (nets.py:653) exactly — torch does
            # not antialias, jax.image.resize does by default
            # (verified: 4x4 ramp -> [2.5,4.5,10.5,12.5] both ways)
            return jax.image.resize(
                h, (h.shape[0], h.shape[1] // 2, h.shape[2] // 2,
                    h.shape[3]), "bilinear", antialias=False)

        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))  # noqa: E731
        x0 = acti(_conv(e[0], 3, 1, "SAME", self.colorchs, "enc0")(x))
        d1 = down(x)
        x1 = acti(_conv(e[1], 3, 1, "SAME", 3 + e[0], "enc1")(
            jnp.concatenate([pool(x0), d1], axis=-1)))
        d2 = down(d1)
        x2 = acti(_conv(e[2], 3, 1, "SAME", 3 + e[1], "enc2")(
            jnp.concatenate([pool(x1), d2], axis=-1)))
        d3 = down(d2)
        x3 = acti(_conv(e[3], 3, 1, "SAME", 3 + e[2], "enc3")(
            jnp.concatenate([pool(x2), d3], axis=-1)))
        x4 = acti(_conv(e[4], 4, 1, "VALID", e[3], "enc4")(pool(x3)))
        u3 = acti(_convT(dd[3], 4, 1, "VALID", dd[4], "dec4")(x4))
        u2 = acti(_conv(dd[2], 3, 1, "SAME", e[3] + dd[3], "dec3")(
            jnp.concatenate([upsample2x(u3), x3], axis=-1)))
        u1 = acti(_conv(dd[1], 3, 1, "SAME", e[2] + dd[2], "dec2")(
            jnp.concatenate([upsample2x(u2), x2], axis=-1)))
        u0 = acti(_conv(dd[0], 3, 1, "SAME", e[1] + dd[1], "dec1")(
            jnp.concatenate([upsample2x(u1), x1], axis=-1)))
        return nn.sigmoid(_conv(1, 3, 1, "SAME", e[0] + dd[0],
                                "dec0")(
            jnp.concatenate([upsample2x(u0), x0], axis=-1)))


class FlexibleUnet(nn.Module):
    """Programmatic-depth hourglass (nets.py:564-643): log2(wid)-1
    stride-2 conv encoder doubling channels from 8*hidfac, mirrored
    ConvTranspose decoder, sigmoid output. No skips."""
    in_dim: int = 3
    chs: int = 1
    wid: int = 64
    hidfac: float = 1.0
    dropout: bool = False
    neck: int = 1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        folds = range(1, int(np.log2(self.wid)))
        bottleneck = max(folds)
        hf = self.hidfac

        def drop(h):
            if self.dropout:
                return nn.Dropout(0.3, deterministic=deterministic)(h)
            return h

        in_ch = self.in_dim
        x = _conv(int(8 * hf), 4, 2, "SAME", in_ch, "enc0")(x)
        x = drop(nn.relu(x))
        for i in folds:
            out_ch = int(2 ** (3 + i) * hf *
                         (self.neck if i == bottleneck else 1))
            x = _conv(out_ch, 4, 2, "SAME", int(2 ** (2 + i) * hf),
                      f"enc{i}")(x)
            x = drop(nn.relu(x))
        for i in reversed(list(folds)):
            in_c = int(2 ** (3 + i) * hf *
                       (self.neck if i == bottleneck else 1))
            x = _convT(int(2 ** (2 + i) * hf), 4, 2, "SAME", in_c,
                       f"dec{i}")(x)
            x = drop(nn.relu(x))
        x = _convT(self.chs, 4, 2, "SAME", int(8 * hf), "dec0")(x)
        return nn.sigmoid(x)


# ---------------------------------------------------------------------
# pretrained-backbone critics (nets.py:704-804)
# ---------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: Array) -> Array:
    """nets.py:802-804 get_normalizer (NHWC)."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class VGG11Features(nn.Module):
    """torchvision vgg11 `.features` in flax (nets.py:753-758):
    64 M 128 M 256 256 M 512 512 M 512 512 M. 64x64 -> (2, 2, 512)."""
    collect_embeds: bool = False

    @nn.compact
    def __call__(self, x: Array):
        cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
               512, 512, "M"]
        embeds = []
        in_ch, li = 3, 0
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = _conv(v, 3, 1, "SAME", in_ch, f"conv{li}")(x)
                x = nn.relu(x)
                if self.collect_embeds:  # VGGEmbedder (nets.py:744-748)
                    # antialias=False: torch F.interpolate(bilinear)
                    # never prefilters — with the default True, any
                    # DOWNsample (inputs > 64x64) diverges from the
                    # reference (latent at 64x64 where all resizes
                    # are upsamples)
                    embeds.append(jax.image.resize(
                        x, (x.shape[0], 64, 64, x.shape[-1]),
                        "bilinear", antialias=False))
                in_ch = v
                li += 1
        if self.collect_embeds:
            return x, jnp.concatenate(embeds, axis=-1)
        return x


class VGGCritic(nn.Module):
    """nets.py:761-787: VGG11 features + 256-128-1 MLP head."""
    resize: int = 64

    @nn.compact
    def __call__(self, x: Array, normalize: bool = True) -> Array:
        if normalize:
            x = imagenet_normalize(x)
        if self.resize != 64:
            # the reference's F.interpolate(X, self.resize)
            # (nets.py:783) uses the DEFAULT mode='nearest'; jax
            # 'nearest' matches it at the integer scale factors the
            # head geometry requires (verified vs torch)
            x = jax.image.resize(
                x, (x.shape[0], self.resize, self.resize, 3),
                "nearest")
        feats = VGG11Features(name="features")(x)
        h = feats.reshape((feats.shape[0], -1))
        fak = self.resize // 64
        h = nn.relu(_dense(256, 512 * 2 * fak * 2 * fak, "fc0")(h))
        h = nn.relu(_dense(128, 256, "fc1")(h))
        return _dense(1, 128, "fc2")(h)


def _bn(train: bool) -> nn.BatchNorm:
    """torch BatchNorm2d semantics: momentum=0.1 in torch is an EMA
    keep-rate of 0.9, which is flax's `momentum` — the flax default
    0.99 would absorb batch statistics ~10x slower than the
    reference during training."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


class ResNetBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        # explicit (1,1) padding: torch pad=1 stride=2 pads BOTH sides;
        # XLA "SAME" at stride 2 pads (0,1) — outputs differ (caught by
        # the round-3 torch golden test, tests/test_zoo_interop.py)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=torch_kernel_init)(x)
        y = _bn(train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=torch_kernel_init)(y)
        y = _bn(train)(y)
        if res.shape != y.shape:
            res = nn.Conv(self.filters, (1, 1),
                          (self.strides, self.strides),
                          use_bias=False,
                          kernel_init=torch_kernel_init)(x)
            res = _bn(train)(res)
        return nn.relu(res + y)


class ResNet18Features(nn.Module):
    """torchvision resnet18 children[0:8] (nets.py:790-793):
    stem + 4 stages of 2 basic blocks. 64x64 -> (2, 2, 512)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=torch_kernel_init)(x)
        x = _bn(train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, filters in enumerate((64, 128, 256, 512)):
            for block in range(2):
                strides = 2 if stage > 0 and block == 0 else 1
                x = ResNetBlock(filters, strides)(x, train=train)
        return x


class ResNetCritic(nn.Module):
    """nets.py:704-730: ImageNet-normalized ResNet18 features +
    256-1 head."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)  # nets.py:721
        x = imagenet_normalize(x)
        feats = ResNet18Features(name="resnet")(x, train=train)
        h = feats.reshape((feats.shape[0], -1))
        h = nn.relu(_dense(256, 512 * 2 * 2, "fc0")(h))
        return _dense(1, 256, "fc1")(h)


class Printer(nn.Module):
    """Shape-printing identity (nets.py:10-16). Traced once under jit,
    so the print uses jax.debug-free host print at trace time — same
    debugging purpose, jit-safe."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        print(x.shape)
        return x


class Pass(nn.Module):
    """Identity module (nets.py:215-220) — the reference's stand-in
    when a Sequential slot needs a no-op (e.g. pooling='none',
    nets.py:227)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x
