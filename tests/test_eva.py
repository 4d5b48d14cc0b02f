"""EVA-02 tower weight-level parity.

timm is not installed in this image, so the oracle is an independent torch
implementation of the EVA-02 block (arXiv 2303.11331: separate q/k/v with
bias-free k, 2D axial rope on patch tokens, sub-LN in attention output and
SwiGLU FFN), written in torch NCHW/(out,in) conventions against timm's
eva02 state-dict naming. It validates models/convert.convert_eva_timm's
layout mapping and the JAX tower numerics (rope pairing, CLS passthrough,
the un-normed layer -1 contract of eva_utils.py:113-128) end to end.
Constants that only a real timm run can pin down (rope temperature 1e4,
position extrapolation to the pretrain grid) are documented in PARITY.md.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


# ----------------------------------------------------------------- oracle
class _TorchEvaAttn(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.q_proj = torch.nn.Linear(dim, dim, bias=True)
        self.k_proj = torch.nn.Linear(dim, dim, bias=False)
        self.v_proj = torch.nn.Linear(dim, dim, bias=True)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)  # sub-LN
        self.proj = torch.nn.Linear(dim, dim, bias=True)

    @staticmethod
    def _rot(x):
        even, odd = x[..., 0::2], x[..., 1::2]
        return torch.stack([-odd, even], dim=-1).reshape(x.shape)

    def forward(self, x, sin, cos):
        B, N, D = x.shape
        h, d = self.heads, D // self.heads
        q = self.q_proj(x).view(B, N, h, d)
        k = self.k_proj(x).view(B, N, h, d)
        v = self.v_proj(x).view(B, N, h, d)

        def rope(t):
            head, rest = t[:, :1], t[:, 1:]
            rest = rest * cos[None, :, None, :] + self._rot(rest) * sin[None, :, None, :]
            return torch.cat([head, rest], dim=1)

        q, k = rope(q), rope(k)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        out = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, N, D)
        return self.proj(self.norm(out))


class _TorchEvaSwiGLU(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w1 = torch.nn.Linear(dim, hidden)
        self.w2 = torch.nn.Linear(dim, hidden)
        self.ffn_ln = torch.nn.LayerNorm(hidden, eps=1e-6)
        self.w3 = torch.nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w3(self.ffn_ln(torch.nn.functional.silu(self.w1(x)) * self.w2(x)))


class _TorchEvaBlock(torch.nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchEvaAttn(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchEvaSwiGLU(dim, hidden)

    def forward(self, x, sin, cos):
        x = x + self.attn(self.norm1(x), sin, cos)
        return x + self.mlp(self.norm2(x))


class _TorchEva(torch.nn.Module):
    """timm-eva02-shaped oracle (state-dict naming: patch_embed.proj,
    cls_token, pos_embed, blocks.N.{norm1,attn.*,norm2,mlp.*}, norm)."""

    def __init__(self, dim=64, heads=4, hidden=128, layers=2, patch=8, image=32):
        super().__init__()
        self.patch, self.image, self.heads = patch, image, heads
        grid = image // patch
        # nested module so keys read patch_embed.proj.*
        self.patch_embed = torch.nn.Module()
        self.patch_embed.proj = torch.nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_TorchEvaBlock(dim, heads, hidden) for _ in range(layers)]
        )
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)  # dead in the wrapper contract

    def _rope(self, gh, gw, head_dim, ref_grid, temperature=10000.0):
        quarter = head_dim // 4
        bands = 1.0 / (temperature ** (torch.arange(quarter, dtype=torch.float64) / quarter))
        ph = torch.arange(gh, dtype=torch.float64) / gh * ref_grid
        pw = torch.arange(gw, dtype=torch.float64) / gw * ref_grid
        ang_h = torch.outer(ph, bands)
        ang_w = torch.outer(pw, bands)
        hh = ang_h[:, None, :].expand(gh, gw, quarter).reshape(-1, quarter)
        ww = ang_w[None, :, :].expand(gh, gw, quarter).reshape(-1, quarter)
        ang = torch.cat([hh, ww], dim=-1).repeat_interleave(2, dim=-1)
        return ang.sin().float(), ang.cos().float()

    def forward(self, img, interpolate=False):
        x = self.patch_embed.proj(img)  # (B, D, gh, gw)
        B, D, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        grid = self.image // self.patch
        pos = self.pos_embed
        if (gh, gw) != (grid, grid):
            assert interpolate
            grid_pos = pos[:, 1:].reshape(1, grid, grid, D).permute(0, 3, 1, 2)
            grid_pos = torch.nn.functional.interpolate(
                grid_pos, size=(gh, gw), mode="bicubic", align_corners=False
            )
            grid_pos = grid_pos.permute(0, 2, 3, 1).reshape(1, gh * gw, D)
            pos = torch.cat([pos[:, :1], grid_pos], dim=1)
        x = torch.cat([self.cls_token.expand(B, 1, D), x], dim=1) + pos
        sin, cos = self._rope(gh, gw, D // self.heads, ref_grid=grid)
        hidden = [x]
        for blk in self.blocks:
            x = blk(x, sin, cos)
            hidden.append(x)
        # eva_utils.py:113-128: raw last-block output; no final norm.
        return hidden, x, x[:, 0]


# ------------------------------------------------------------------ tests
@pytest.fixture(scope="module")
def pair():
    from vfm_vae_tpu.models.eva import EVATower, convert_eva_timm

    torch.manual_seed(7)
    ref = _TorchEva().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_eva_timm(sd)
    ours = EVATower(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
                    patch_size=8, image_size=32)
    return ref, ours, {"params": params}


def test_eva_param_tree_matches_init(pair):
    import flax.traverse_util as tu

    ref, ours, variables = pair
    want = tu.flatten_dict(
        ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"], sep="/"
    )
    got = tu.flatten_dict(variables["params"], sep="/")
    assert sorted(got) == sorted(want), (
        sorted(set(want) ^ set(got))[:10]
    )
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)


def test_eva_bitlevel_static_grid(pair):
    ref, ours, variables = pair
    img = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hs_t, last_t, pooled_t = ref(torch.from_numpy(img).permute(0, 3, 1, 2))
    hs, last, pooled = ours.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(last), last_t.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(), rtol=2e-5, atol=2e-5)
    for i in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(hs[i]), hs_t[i].numpy(), rtol=2e-5, atol=2e-5, err_msg=f"layer {i}"
        )


def test_eva_bitlevel_dynamic_grid(pair):
    """48px on a 32px-trained tower: pos-embed bicubic resize + rope
    position extrapolation to the pretrain grid must agree."""
    ref, ours, variables = pair
    img = np.random.default_rng(1).random((2, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        _, last_t, pooled_t = ref(
            torch.from_numpy(img).permute(0, 3, 1, 2), interpolate=True
        )
    _, last, pooled = ours.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(last), last_t.numpy(), rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(), rtol=5e-5, atol=5e-5)
