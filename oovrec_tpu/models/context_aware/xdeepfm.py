"""xDeepFM (`recbole/model/context_aware_recommender/xdeepfm.py:34-219`):
CIN (outer-product einsum + per-layer 1×1 conv == dense over the pair
axis) + MLP + first-order linear, BCE-with-logits + L2 reg."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce_with_logits


class CinConv(nn.Module):
    """Per-layer CIN conv parameters (kernel (H·F, L), bias (L,)) — the
    same param tree as the nn.Dense it replaces (checkpoints and torch
    imports are layout-identical). `__call__` is the XLA fallback; the
    fused path reads `.kernel`/`.bias` and runs ops/cin_fused.cin_layer."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", xavier_normal, (self.in_features, self.features)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def __call__(self, x):
        from oovrec_tpu.utils.precision import compute_dtype

        dt = compute_dtype()
        return x.astype(dt) @ self.kernel.astype(dt) + self.bias.astype(dt)


@register_model
class xDeepFM(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    mlp_hidden_size: Tuple[int, ...] = (128, 128, 128)
    reg_weight: float = 5e-4
    dropout_prob: float = 0.2
    direct: bool = False
    cin_layer_size: Tuple[int, ...] = (100, 100, 100)
    # 'auto' runs the fused Pallas CIN (ops/cin_fused.py) on TPU — same
    # math, no Hadamard-slab HBM round-trip; False forces the XLA path
    fused_cin: Any = "auto"

    def setup(self):
        # non-direct mode halves intermediate layers to even sizes
        # (`xdeepfm.py:50-57`)
        cin = list(self.cin_layer_size)
        if not self.direct:
            cin = [int(x // 2 * 2) for x in cin]
        self._cin_sizes = tuple(cin)

        field_nums = [self.fields.num_feature_field]
        convs = []
        for i, layer_size in enumerate(self._cin_sizes):
            convs.append(
                CinConv(
                    field_nums[0] * field_nums[i], layer_size,
                    name=f"conv1d_{i}",
                )
            )
            field_nums.append(
                layer_size if self.direct else layer_size // 2
            )
        self.conv1d_list = convs
        self._field_nums = tuple(field_nums)

        if self.direct:
            final_len = sum(self._cin_sizes)
        else:
            final_len = sum(self._cin_sizes[:-1]) // 2 + self._cin_sizes[-1]
        self.cin_linear = nn.Dense(1, kernel_init=xavier_normal)
        self.mlp_layers = MLPLayers(
            (self.in_feature_num,) + tuple(self.mlp_hidden_size) + (1,),
            dropout=self.dropout_prob,
        )
        self._setup_context()

    def _use_fused_cin(self, b: int = 0) -> bool:
        if self.fused_cin is False or self.fused_cin == "false":
            return False
        if self.fused_cin is True or self.fused_cin == "true":
            return True
        import jax

        # auto: the kernels' (sublane, lane) merge reshape needs a
        # 128-lane batch tile — Mosaic rejects smaller ones (verified on
        # the toy fixture); tiny batches take the XLA slab path instead
        return jax.devices()[0].platform == "tpu" and b % 128 == 0

    def compressed_interaction_network(self, x, activation="relu"):
        """(B, F, D) → (B, final_len): pairwise Hadamard feature maps,
        1×1 conv over the pair axis (== Dense on axis 1), sum-pool over D
        (`xdeepfm.py:134-193`). Computes in the global precision policy
        (utils/precision.py): with `compute_dtype: bfloat16` the Hadamard
        slabs and pair-axis matmuls run bf16 (fp32 accumulate on the MXU).

        On TPU (`fused_cin: auto`) each layer runs the fused Pallas kernel
        (ops/cin_fused.py): batch-minor layout, the Hadamard slab lives
        only in VMEM — the profiled XLA path spent ~2/3 of the step
        round-tripping that slab through HBM."""
        from oovrec_tpu.utils.precision import compute_dtype

        dt = compute_dtype()
        b, _, d = x.shape
        if self._use_fused_cin(b):
            from oovrec_tpu.ops.cin_fused import cin_io_dtype, cin_layer_pooled

            # split-free pooled kernels (round 5): each layer emits the
            # next hidden plus the D-pooled direct-connect rows directly
            # from VMEM — no jnp.split pad copies, no (L, D, B) HBM
            # round-trip of the pooled half. I/O rides bf16 when the
            # block layout allows (cin_io_dtype), else f32.
            io = cin_io_dtype(d, b, dt)
            xb = x.astype(io).transpose(1, 2, 0)       # (F, D, B)
            hidden = xb
            pooled_parts = []
            last = len(self._cin_sizes) - 1
            for i, layer_size in enumerate(self._cin_sizes):
                conv = self.conv1d_list[i]
                if self.direct:
                    nh, pool_all = layer_size, True
                elif i != last:
                    nh, pool_all = layer_size // 2, False
                else:
                    nh, pool_all = 0, True
                hidden, pooled = cin_layer_pooled(
                    hidden, xb, conv.kernel, conv.bias, mxu_dtype=dt,
                    n_hidden=nh, pool_all=pool_all,
                )                                      # (Lp, B) f32
                pooled_parts.append(pooled)
            return jnp.concatenate(pooled_parts, axis=0).T  # (B, ΣLp)

        hidden = [x.astype(dt)]
        finals = []
        for i, layer_size in enumerate(self._cin_sizes):
            z = jnp.einsum("bhd,bmd->bhmd", hidden[-1], hidden[0])
            z = z.reshape(b, self._field_nums[0] * self._field_nums[i], d)
            # conv1d with kernel 1 over channels == dense on the pair axis
            out = self.conv1d_list[i](z.transpose(0, 2, 1)).transpose(0, 2, 1)
            out = nn.relu(out)
            if self.direct:
                direct_connect, next_hidden = out, out
            elif i != len(self._cin_sizes) - 1:
                next_hidden, direct_connect = jnp.split(out, 2, axis=1)
            else:
                direct_connect, next_hidden = out, None
            finals.append(direct_connect)
            if next_hidden is not None:
                hidden.append(next_hidden)
        result = jnp.concatenate(finals, axis=1)
        return jnp.sum(result.astype(jnp.float32), axis=-1)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        cin_out = self.cin_linear(self.compressed_interaction_network(emb))
        b = emb.shape[0]
        dnn_out = self.mlp_layers(emb.reshape(b, -1), train=train)
        y = self.first_order_linear(batch, estate) + cin_out + dnn_out
        return y.squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        label = batch[self.label_field]
        out = self.forward(batch, estate, train=True)
        # L2 over mlp/linear/conv kernels (`xdeepfm.py:120-132`), applied
        # via the variables tree in the wrapper below
        reg = self._reg_from_scope()
        return bce_with_logits(out, label, batch.get("weight")) + self.reg_weight * reg

    def _reg_from_scope(self):
        """Σ ‖W‖₂ over Dense kernels of mlp, first-order tables and convs."""
        reg = 0.0
        for conv in self.conv1d_list:
            reg = reg + jnp.linalg.norm(conv.variables["params"]["kernel"])
        mlp_params = self.mlp_layers.variables.get("params", {})
        for v in jax.tree_util.tree_leaves(
            {k: p for k, p in mlp_params.items() if "Dense" in k}
        ):
            if v.ndim >= 2:
                reg = reg + jnp.linalg.norm(v)
        fo = self.first_order_linear.variables.get("params", {})
        for v in jax.tree_util.tree_leaves(fo):
            if hasattr(v, "ndim") and v.ndim >= 2:
                reg = reg + jnp.linalg.norm(v)
        return reg

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


import jax  # noqa: E402  (used in _reg_from_scope)
