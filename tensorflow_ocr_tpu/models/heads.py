"""Detection heads: PixelLink (pixel+link) and EAST (score+RBOX).

Rebuilds of the reference's fusion heads:

- PixelLink/ResNet: 1x1-conv + unpool + add fusion over {pool5..pool2} into
  2-ch pixel and 16-ch link logits at stride 4, final 1x1 projections with
  no activation/BN (/root/reference/nets/model.py:105-143).
- PixelLink/VGG: same fusion over {fc7, conv5_3, conv4_3, conv3_3}
  (/root/reference/nets/model_vgg_16.py:160-177). The reference's final
  projections there accidentally inherit BN+ReLU from the arg_scope; we
  emit clean logits like the primary model — documented deviation.
- EAST merge: concat -> 1x1 -> 3x3 -> unpool FPN with channels
  [None,128,64,32], then 1-ch sigmoid score, 4-ch sigmoid*text_scale
  distances, 1-ch angle in [-pi/4, pi/4]
  (/root/reference/nets/model.py:33-82).
- Link8/EAST-merge hybrid: 1-ch sigmoid score + 8-ch sigmoid link
  probabilities (/root/reference/nets/model_vgg_16.py:85-136).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import ConvBN, unpool

PIXEL_OUTPUT = 2   # reference nets/model.py:113
LINK_OUTPUT = 16   # reference nets/model.py:114


class PixelLinkHead(nn.Module):
    """Upsample-and-add fusion head (reference nets/model.py:129-141).

    feature_keys order: coarsest first (e.g. pool5, pool4, pool3, pool2).
    Fusion convs are slim-default conv+BN+ReLU; the two final 1x1
    projections have no activation and no BN (model.py:139-141).
    """

    feature_keys: Sequence[str] = ("pool5", "pool4", "pool3", "pool2")
    upsample_first: bool = True  # VGG variant fuses fc7+conv5_3 at same stride
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ep: Dict[str, jnp.ndarray], train: bool = False):
        def branch(out_ch: int, tag: str) -> jnp.ndarray:
            feats = [ep[k] for k in self.feature_keys]
            x = ConvBN(out_ch, (1, 1), dtype=self.dtype,
                       name=f"{tag}_proj0")(feats[0], train)
            for i, f in enumerate(feats[1:], start=1):
                if i > 1 or self.upsample_first:
                    x = unpool(x)
                x = x + ConvBN(out_ch, (1, 1), dtype=self.dtype,
                               name=f"{tag}_proj{i}")(f, train)
            return nn.Conv(
                out_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{tag}_logits",
            )(x)

        pixel_logits = branch(PIXEL_OUTPUT, "pixel")
        link_logits = branch(LINK_OUTPUT, "link")
        return {
            "pixel_logits": pixel_logits.astype(jnp.float32),
            "link_logits": link_logits.astype(jnp.float32),
        }


class EASTMerge(nn.Module):
    """EAST FPN merge stage (reference nets/model.py:54-71).

    ``upsample_first=False`` supports VGG pyramids whose two coarsest maps
    share a stride (fc7 and conv5_3 are both stride 16, since the
    reference's pool5 is 3x3 stride-1 — nets/vgg.py:32).
    """

    feature_keys: Sequence[str] = ("pool5", "pool4", "pool3", "pool2")
    num_outputs: Sequence[int] = (0, 128, 64, 32)  # [None,128,64,32]
    upsample_first: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ep: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        f = [ep[k] for k in self.feature_keys]
        g = None
        h = None
        for i in range(4):
            if i == 0:
                h = f[0]
            else:
                c = ConvBN(self.num_outputs[i], (1, 1), dtype=self.dtype,
                           name=f"merge{i}_1x1")(
                    jnp.concatenate([g, f[i]], axis=-1), train)
                h = ConvBN(self.num_outputs[i], (3, 3), dtype=self.dtype,
                           name=f"merge{i}_3x3")(c, train)
            if i <= 2:
                g = unpool(h) if (i > 0 or self.upsample_first) else h
            else:
                g = ConvBN(self.num_outputs[i], (3, 3), dtype=self.dtype,
                           name="merge3_final")(h, train)
        return g


class EASTHead(nn.Module):
    """Score + geometry outputs (reference nets/model.py:76-82).

    geometry="RBOX" (default): 4 sigmoid-scaled edge distances + angle.
    geometry="QUAD": 8 linear signed corner offsets (EAST paper §3.3.2;
    declared but unimplemented in the reference, datasets/icdar.py:30).
    """

    text_scale: int = 512
    geometry: str = "RBOX"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, g: jnp.ndarray, train: bool = False):
        def head_conv(ch: int, name: str) -> jnp.ndarray:
            return nn.Conv(ch, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(g).astype(jnp.float32)

        score = nn.sigmoid(head_conv(1, "score"))
        if self.geometry == "QUAD":
            # signed offsets: raw linear regression (the loss normalizes
            # by the instance's short edge, so the scale is benign)
            return {"score": score, "geometry": head_conv(8, "geo")}
        geo = nn.sigmoid(head_conv(4, "geo")) * float(self.text_scale)
        angle = (nn.sigmoid(head_conv(1, "angle")) - 0.5) * (np.pi / 2)
        return {
            "score": score,
            "geometry": jnp.concatenate([geo, angle], axis=-1),
        }


class Link8Head(nn.Module):
    """1-ch sigmoid score + 8-ch sigmoid link probs
    (reference nets/model_vgg_16.py:129-136)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, g: jnp.ndarray, train: bool = False):
        def head_conv(ch: int, name: str) -> jnp.ndarray:
            return nn.Conv(ch, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(g).astype(jnp.float32)

        return {
            "score": nn.sigmoid(head_conv(1, "score")),
            "link_probs": nn.sigmoid(head_conv(8, "links")),
        }
