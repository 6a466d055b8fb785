"""Functional torch oracle of the F-Lite DiT forward, for parity testing.

Written from the math spec (SURVEY.md §2.1/§3.2), not copied from the
reference: plain-torch SDPA instead of flash-attn varlen, explicit loops,
functional style over a raw state dict. Used to validate (a) the torch->jax
weight conversion and (b) numerical parity of the JAX model, which is the
per-step latent parity harness SURVEY.md §4(c) calls for.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def rms(x, w=None, eps=1e-6):
    x32 = x.float()
    y = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + eps)
    if w is not None:
        y = y * w.float()
    return y.to(x.dtype)


def sinusoidal(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1)


def rope_tables(head_dim, h, w, base=10000.0, n_register=16):
    dim = head_dim // 2
    inv = torch.tensor(
        [1.0 / base ** (i / dim) for i in range(0, dim, 2)],
        dtype=torch.float32,
    )
    fh = torch.outer(torch.arange(h, dtype=torch.float32), inv)
    fw = torch.outer(torch.arange(w, dtype=torch.float32), inv)
    fh = fh[:, None, :].expand(h, w, -1)
    fw = fw[None, :, :].expand(h, w, -1)
    f = torch.cat([fh, fw], -1).reshape(h * w, dim)
    cos, sin = f.cos(), f.sin()
    cos = torch.cat([torch.ones(n_register, dim), cos], 0)
    sin = torch.cat([torch.zeros(n_register, dim), sin], 0)
    return cos, sin


def rot(x, cos, sin):
    # x: (B, H, L, D); cos/sin: (L, D/2)
    x32 = x.float()
    d = x32.shape[-1] // 2
    x1, x2 = x32[..., :d], x32[..., d:]
    y1 = x1 * cos + x2 * sin
    y2 = -x1 * sin + x2 * cos
    return torch.cat([y1, y2], -1).to(x.dtype)


def lin(x, sd, name):
    w = sd[f"{name}.weight"]
    b = sd.get(f"{name}.bias")
    return F.linear(x, w, b)


def self_attention(sd, base, x, heads, cos, sin, lambda_v=None, v_first=None):
    B, L, D = x.shape
    dh = D // heads
    qkv = lin(x, sd, f"{base}.qkv").reshape(B, L, 3, heads, dh)
    qkv = qkv.permute(2, 0, 3, 1, 4)  # 3, B, H, L, dh
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = rot(q, cos, sin)
    k = rot(k, cos, sin)
    if v_first is not None:
        v = lambda_v * v + (1 - lambda_v) * v_first
        v_out = v_first
    else:
        v_out = v
    q, k = rms(q), rms(k)
    o = F.scaled_dot_product_attention(q, k, v, scale=dh**-0.5)
    o = o.permute(0, 2, 1, 3).reshape(B, L, D)
    return lin(o, sd, f"{base}.proj"), v_out


def cross_attention(sd, base, x, ctx, mask, heads):
    B, L, D = x.shape
    S = ctx.shape[1]
    dh = D // heads
    q = lin(x, sd, f"{base}.q").reshape(B, L, heads, dh).permute(0, 2, 1, 3)
    kv = lin(ctx, sd, f"{base}.context_kv").reshape(B, S, 2, heads, dh)
    kv = kv.permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    q, k = rms(q), rms(k)
    attn_mask = None
    if mask is not None:
        attn_mask = mask[:, None, None, :].bool()
    o = F.scaled_dot_product_attention(
        q, k, v, attn_mask=attn_mask, scale=dh**-0.5
    )
    o = o.permute(0, 2, 1, 3).reshape(B, L, D)
    return lin(o, sd, f"{base}.proj")


def swiglu(sd, base, x):
    return lin(F.silu(lin(x, sd, f"{base}.gate_proj"))
               * lin(x, sd, f"{base}.up_proj"), sd, f"{base}.down_proj")


@torch.no_grad()
def oracle_dit_forward(sd, cfg, x_nchw, context, mask, t):
    """cfg: f_lite_tpu DiTConfig. x_nchw: (B, C, H, W) torch. Returns NCHW."""
    p = cfg.patch_size
    heads = cfg.num_heads
    D = cfg.hidden_size
    B, C, H, W = x_nchw.shape
    gh, gw = H // p, W // p

    ctx = lin(context, sd, "context_proj")
    ctx = rms(ctx, sd["context_norm.weight"])

    xe = F.conv2d(
        x_nchw, sd["patch_embed.patch_proj.weight"],
        sd["patch_embed.patch_proj.bias"], stride=p,
    )
    tokens = xe.flatten(2).transpose(1, 2)  # B, gh*gw, D
    tokens = torch.cat(
        [sd["register_tokens"].expand(B, -1, -1), tokens], 1
    )

    cos, sin = rope_tables(
        D // heads, gh, gw, base=cfg.rope_base,
        n_register=cfg.n_register_tokens,
    )

    temb = sinusoidal(t * 1000.0, D)
    temb = lin(F.silu(lin(temb, sd, "time_embed.0")), sd, "time_embed.2")

    if cfg.adaln_mode == "shared":
        mod9 = lin(F.silu(temb), sd, "adaLN_modulation.1").chunk(9, dim=1)

    v_first = None
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        if cfg.adaln_mode == "per_block":
            mod9 = lin(
                F.silu(temb), sd, f"{b}.adaLN_modulation.1"
            ).chunk(9, dim=1)
        (s_sa, sc_sa, g_sa, s_ca, sc_ca, g_ca, s_m, sc_m, g_m) = [
            m[:, None, :] for m in mod9
        ]

        nx = rms(tokens, sd[f"{b}.norm1.weight"]) * (1 + sc_sa) + s_sa
        if cfg.residual_v:
            lam = sd.get(f"{b}.self_attn.lambda_v")
            att, v_first = self_attention(
                sd, f"{b}.self_attn", nx, heads, cos, sin,
                lambda_v=lam, v_first=v_first,
            )
        else:
            att, _ = self_attention(sd, f"{b}.self_attn", nx, heads, cos, sin)
        tokens = tokens + att * g_sa

        if cfg.block_has_cross_attn(i):
            nx = rms(tokens, sd[f"{b}.norm2.weight"]) * (1 + sc_ca) + s_ca
            tokens = tokens + cross_attention(
                sd, f"{b}.cross_attn", nx, ctx, mask, heads
            ) * g_ca

        nx = rms(tokens, sd[f"{b}.norm3.weight"]) * (1 + sc_m) + s_m
        tokens = tokens + swiglu(sd, f"{b}.mlp", nx) * g_m

    tokens = tokens[:, cfg.n_register_tokens:, :]
    fs, fsc = lin(F.silu(temb), sd, "final_modulation.1").chunk(2, dim=1)
    tokens = rms(tokens, sd.get("final_norm.weight"))
    tokens = tokens * (1 + fsc[:, None, :]) + fs[:, None, :]
    tokens = lin(tokens, sd, "final_proj")

    # "b (h w) (p1 p2 c) -> b c (h p1) (w p2)"
    out = tokens.reshape(B, gh, gw, p, p, C)
    out = out.permute(0, 5, 1, 3, 2, 4).reshape(B, C, gh * p, gw * p)
    return out


def make_random_state_dict(cfg, seed=0):
    """Random torch state dict with the reference's exact key set/shapes.

    Weight matrices are fan-in scaled (std = 0.5/sqrt(fan_in)) so hidden
    activations stay O(1) at ANY width/depth — a fixed std would make
    each matmul amplify by std*sqrt(fan_in), which at 1-2B-scale widths
    (hidden 2048+) turns the depth-24 net chaotic and makes parity
    numbers meaningless (any rounding difference explodes). At the small
    widths the unit tests use (64-128) this matches the old fixed 0.05
    closely, so tolerances carry over.
    """
    g = torch.Generator().manual_seed(seed)
    D = cfg.hidden_size
    inter = int(D * cfg.mlp_ratio)
    bias = cfg.train_bias_and_rms

    def r(*shape, scale=None):
        if scale is None:
            fan_in = 1
            for s in shape[1:]:
                fan_in *= s
            scale = 0.5 / fan_in ** 0.5 if fan_in > 1 else 0.05
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "context_proj.weight": r(D, cfg.cross_attn_input_size),
        "context_proj.bias": r(D),
        "context_norm.weight": 1 + r(D),
        "patch_embed.patch_proj.weight": r(
            D, cfg.in_channels, cfg.patch_size, cfg.patch_size
        ),
        "patch_embed.patch_proj.bias": r(D),
        "register_tokens": r(1, cfg.n_register_tokens, D, scale=1.0),
        "time_embed.0.weight": r(4 * D, D),
        "time_embed.0.bias": r(4 * D),
        "time_embed.2.weight": r(D, 4 * D),
        "time_embed.2.bias": r(D),
        "final_modulation.1.weight": r(2 * D, D),
        "final_modulation.1.bias": r(2 * D),
        "final_proj.weight": r(cfg.patch_size**2 * cfg.in_channels, D),
        "final_proj.bias": r(cfg.patch_size**2 * cfg.in_channels),
    }
    if cfg.adaln_mode == "shared":
        sd["adaLN_modulation.1.weight"] = r(9 * D, D)
        sd["adaLN_modulation.1.bias"] = r(9 * D)
    if cfg.train_bias_and_rms:
        sd["final_norm.weight"] = 1 + r(D)
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = 1 + r(D)
        sd[f"{b}.norm3.weight"] = 1 + r(D)
        sd[f"{b}.self_attn.qkv.weight"] = r(3 * D, D)
        sd[f"{b}.self_attn.proj.weight"] = r(D, D)
        if bias:
            sd[f"{b}.self_attn.qkv.bias"] = r(3 * D)
        if cfg.residual_v and i > 0:
            sd[f"{b}.self_attn.lambda_v"] = torch.rand(1, generator=g)
        sd[f"{b}.mlp.gate_proj.weight"] = r(inter, D)
        sd[f"{b}.mlp.up_proj.weight"] = r(inter, D)
        sd[f"{b}.mlp.down_proj.weight"] = r(D, inter)
        if cfg.adaln_mode == "per_block":
            sd[f"{b}.adaLN_modulation.1.weight"] = r(9 * D, D)
            sd[f"{b}.adaLN_modulation.1.bias"] = r(9 * D)
        if cfg.block_has_cross_attn(i):
            sd[f"{b}.norm2.weight"] = 1 + r(D)
            sd[f"{b}.cross_attn.q.weight"] = r(D, D)
            sd[f"{b}.cross_attn.context_kv.weight"] = r(2 * D, D)
            sd[f"{b}.cross_attn.proj.weight"] = r(D, D)
            if bias:
                sd[f"{b}.cross_attn.q.bias"] = r(D)
                sd[f"{b}.cross_attn.context_kv.bias"] = r(2 * D)
    return sd
