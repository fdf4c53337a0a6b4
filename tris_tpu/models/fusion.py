"""Cross-modal attention fusion modules (NHWC re-design of `/root/reference/model/attn.py`).

``PixelAttention`` (LAVT-style pixel-word attention, attn.py:9-65) and
``BilateralPrompt`` (symmetric vision<->language cross-attention, attn.py:68-136).
All 1x1 convs become Dense layers on the channel-last axis — identical math,
and XLA fuses them into the surrounding einsums.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from tris_tpu.models.layers import InstanceNorm2d


class PixelAttention(nn.Module):
    """Pixel-word attention: every pixel attends over the T language tokens.

    vis: [N, H, W, Ci], lan: [N, T, Ct] -> [N, H, W, Ci]
    """

    visual_channel: int
    language_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vis: jnp.ndarray, lan: jnp.ndarray) -> jnp.ndarray:
        Ci = self.visual_channel
        N, H, W, _ = vis.shape
        Lk = nn.Dense(Ci, dtype=self.dtype, name="Wk")(lan)  # [N, T, Ci]
        Lv = nn.Dense(Ci, dtype=self.dtype, name="Wv")(lan)
        Vq = InstanceNorm2d(Ci, dtype=self.dtype, name="ins_q")(
            nn.Dense(Ci, dtype=self.dtype, name="Wq")(vis)
        )
        q = Vq.reshape(N, H * W, Ci)
        attn = jax.nn.softmax(jnp.einsum("npc,ntc->npt", q, Lk) / math.sqrt(Ci), axis=2)
        G = jnp.einsum("npt,ntc->npc", attn, Lv).reshape(N, H, W, Ci)
        Gi = InstanceNorm2d(Ci, dtype=self.dtype, name="ins_w")(
            nn.Dense(Ci, dtype=self.dtype, name="Ww")(G)
        )
        Vo = nn.relu(nn.Dense(Ci, dtype=self.dtype, name="Wm")(vis))
        return nn.relu(nn.Dense(Ci, dtype=self.dtype, name="Wo")(Vo * Gi))


class BilateralPrompt(nn.Module):
    """Symmetric cross-attention: vision queries attend language K/V and vice
    versa, with InstanceNorm'd projections (attn.py:68-136).

    vis: [N, H, W, C], lan: [N, T, C] -> (new_vis [N, H, W, C], new_lan [N, T, C])
    """

    vis_chans: int
    lan_chans: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vis: jnp.ndarray, lan: jnp.ndarray):
        m = self.vis_chans
        N, H, W, C = vis.shape
        Ci = lan.shape[-1]

        def v_proj(name):
            def f(x):
                x = nn.Dense(m, dtype=self.dtype, name=f"{name}_fc")(x)
                x = InstanceNorm2d(m, dtype=self.dtype, name=f"{name}_in")(x)
                return nn.relu(x)
            return f

        def t_proj(name):
            def f(x):
                return nn.relu(nn.Dense(m, dtype=self.dtype, name=f"{name}_fc")(x))
            return f

        Qv = v_proj("v_proj1")(vis).reshape(N, H * W, m)
        Kv = v_proj("v_proj2")(vis).reshape(N, H * W, m)
        Vv = v_proj("v_proj3")(vis).reshape(N, H * W, m)
        Qt = t_proj("t_proj1")(lan)
        Kt = t_proj("t_proj2")(lan)
        Vt = t_proj("t_proj3")(lan)

        Av = jax.nn.softmax(jnp.einsum("npm,ntm->npt", Qv, Kt) / math.sqrt(Ci), axis=2)
        At = jax.nn.softmax(jnp.einsum("ntm,npm->ntp", Qt, Kv) / math.sqrt(Ci), axis=2)

        new_vis = jnp.einsum("npt,ntm->npm", Av, Vt).reshape(N, H, W, m)
        new_lan = jnp.einsum("ntp,npm->ntm", At, Vv)

        new_vis = nn.Dense(self.vis_chans, dtype=self.dtype, name="v_output_fc")(new_vis)
        new_vis = InstanceNorm2d(self.vis_chans, dtype=self.dtype, name="v_output_in")(new_vis)
        new_lan = nn.Dense(self.lan_chans, dtype=self.dtype, name="t_output_fc")(new_lan)
        return new_vis, new_lan
