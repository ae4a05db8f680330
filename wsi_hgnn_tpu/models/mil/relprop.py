"""LRP relevance propagation for the GTNMIL ViT — true GraphCAM.

Reproduces the reference's transformer-LRP explanation (Chefer-style
"transformer attribution"):

* the per-module LRP rules of
  /root/reference/baselines/GTNMIL/models/layers.py — ``safe_divide``
  (:10-13), the alpha-beta ``Linear`` rule (:207-230, run at alpha=1 as
  GraphTransformer.py:97 passes ``{"alpha": 1}``), the generic
  ``RelPropSimple`` rule for einsum matmuls (:48-59), the renormalised
  ``Add`` rule (:96-119), ``Clone`` (:146-166) and ``IndexSelect``
  (:128-142); ``Softmax``/``LayerNorm``/``GELU``/``Dropout`` relprop is the
  identity (:67-79);
* the module-level relprop order of
  /root/reference/baselines/GTNMIL/models/ViT.py — ``Attention.relprop``
  (:217-240, including the divide-by-2 after each matmul split and the
  ``attn_cam`` capture point), ``Block.relprop`` (:266-277),
  ``VisionTransformer.relprop`` (:341-385) and
  ``compute_rollout_attention`` (:89-100);
* the GraphCAM driver procedure of
  /root/reference/baselines/GTNMIL/models/GraphTransformer.py:86-101 —
  attention gradients taken of ``sum(one_hot * softmax(logits))`` where the
  one-hot carries the (detached) predicted-class probability, and the
  relprop seeded with that same one-hot vector.

Everything here is a pure function of the flax param tree produced by
``models.mil.graph_transformer.GraphTransformer`` (blocks named
``blocks_{i}`` with ``norm1/qkv/proj/norm2/fc1/fc2``, plus ``norm`` and
``head``), so it composes with jit/vmap. The torch reference's module
hooks/state are replaced by one recording forward pass plus additive
zero "taps" on each block's attention tensor, differentiated with
``jax.grad`` to obtain the attention gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_divide(a, b):
    """layers.py:10-13 byte-for-byte: denominator pushed away from 0 by
    1e-9 on its own sign, exact-zero denominators zero the output."""
    den = jnp.clip(b, min=1e-9) + jnp.clip(b, max=1e-9)
    den = den + (den == 0).astype(den.dtype) * 1e-9
    return a / den * (b != 0).astype(b.dtype)


def linear_relprop(R, x, kernel):
    """Alpha-beta LRP for a Linear layer at alpha=1 (layers.py:207-230):
    only the activator term x+·w+ + x-·w- survives; bias excluded.

    kernel is the flax [in, out] layout (torch stores [out, in])."""
    pw = jnp.maximum(kernel, 0.0)
    nw = jnp.minimum(kernel, 0.0)
    px = jnp.maximum(x, 0.0)
    nx = jnp.minimum(x, 0.0)
    Z = px @ pw + nx @ nw
    S = safe_divide(R, Z)
    return px * (S @ pw.T) + nx * (S @ nw.T)


def simple_relprop(f, R, *xs):
    """RelPropSimple (layers.py:48-59): S = R/Z, C = vjp(S), out = x*C."""
    Z, vjp = jax.vjp(f, *xs)
    S = safe_divide(R, Z)
    Cs = vjp(S)
    return tuple(x * c for x, c in zip(xs, Cs))


def add_relprop(R, x0, x1):
    """The renormalised Add rule (layers.py:96-119): split by S=R/Z, then
    rescale each branch so the branch totals divide R.sum() by the branch
    magnitudes."""
    S = safe_divide(R, x0 + x1)
    a = x0 * S
    b = x1 * S
    a_sum = a.sum()
    b_sum = b.sum()
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = safe_divide(jnp.abs(a_sum), tot) * R.sum()
    b_fact = safe_divide(jnp.abs(b_sum), tot) * R.sum()
    return a * safe_divide(a_fact, a.sum()), b * safe_divide(b_fact, b.sum())


def clone_relprop(Rs, x):
    """Clone (layers.py:146-166): R = x * sum_i(R_i / x)."""
    S = sum(safe_divide(R, x) for R in Rs)
    return x * S


def _layer_norm(x, p, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _block_params(params):
    depth = 0
    while f"blocks_{depth}" in params:
        depth += 1
    return depth


def vit_forward(params, x, heads=8, attn_taps=None, record=None):
    """Pure-function twin of the flax ViT tail (blocks -> norm -> cls head),
    mirroring VisionTransformer.forward (ViT.py:328-339) and
    Attention/Block.forward (:183-214, :259-264).

    ``attn_taps``: optional per-block additive tensors on the post-softmax
    attention — differentiate w.r.t. them to obtain the reference's
    ``save_attn_gradients`` hook values (ViT.py:205-207).
    ``record``: optional dict populated with every intermediate the LRP
    backward pass needs (the torch forward hooks' ``self.X``)."""
    depth = _block_params(params)
    b, n, dim = x.shape
    hd = dim // heads
    scale = hd ** -0.5
    blocks = []
    for i in range(depth):
        p = params[f"blocks_{i}"]
        x_in = x
        h = _layer_norm(x, p["norm1"], 1e-6)
        qkv = h @ p["qkv"]["kernel"]  # no bias (ViT.py qkv_bias=False)
        # einops 'b n (qkv h d) -> qkv b h n d' (ViT.py:186)
        qkv = qkv.reshape(b, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        dots_raw = jnp.einsum("bhid,bhjd->bhij", q, k)
        attn = jax.nn.softmax(dots_raw * scale, axis=-1)
        if attn_taps is not None:
            attn = attn + attn_taps[i]
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        proj_in = out.transpose(0, 2, 1, 3).reshape(b, n, dim)
        attn_out = proj_in @ p["proj"]["kernel"] + p["proj"]["bias"]
        x_mid = x_in + attn_out
        h2 = _layer_norm(x_mid, p["norm2"], 1e-6)
        h1 = h2 @ p["fc1"]["kernel"] + p["fc1"]["bias"]
        g = jax.nn.gelu(h1, approximate=False)
        f2 = g @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = x_mid + f2
        if record is not None:
            blocks.append(dict(
                x_in=x_in, h=h, q=q, k=k, v=v, attn=attn, proj_in=proj_in,
                attn_out=attn_out, x_mid=x_mid, h2=h2, g=g, f2=f2,
            ))
    nrm = _layer_norm(x, params["norm"], 1e-5)  # torch LayerNorm default eps
    cls = nrm[:, 0]
    logits = cls @ params["head"]["kernel"] + params["head"]["bias"]
    if record is not None:
        record["blocks"] = blocks
        record["nrm"] = nrm
        record["cls"] = cls
    return logits


def compute_rollout_attention(all_layer_matrices, start_layer=0):
    """ViT.py:89-100: add identity per layer, chain-multiply upward."""
    eye = jnp.eye(all_layer_matrices[0].shape[-1])
    mats = [m + eye for m in all_layer_matrices]
    joint = mats[start_layer]
    for i in range(start_layer + 1, len(mats)):
        joint = mats[i] @ joint
    return joint


def vit_relprop(params, x, class_idx, heads=8,
                method="transformer_attribution", start_layer=0):
    """GraphCAM over the ViT input tokens: returns the cls-token relevance
    row over the non-cls tokens, shape [n_tokens - 1].

    Follows GraphTransformer.py:86-101 + ViT.py:341-385 at alpha=1."""
    rec = {}
    logits = vit_forward(params, x, heads=heads, record=rec)
    probs = jax.nn.softmax(logits, axis=-1)
    p_c = jax.lax.stop_gradient(probs[0, class_idx])

    # attention gradients of sum(one_hot * softmax(logits)); the one-hot
    # carries the detached class probability (GraphTransformer.py:90-95)
    taps = [jnp.zeros_like(blk["attn"]) for blk in rec["blocks"]]

    def scored(taps):
        lg = vit_forward(params, x, heads=heads, attn_taps=taps)
        return p_c * jax.nn.softmax(lg, axis=-1)[0, class_idx]

    attn_grads = jax.grad(scored)(taps)

    # LRP backward pass, seeded with the same one-hot (ViT.py:344-349)
    n_cls = logits.shape[-1]
    R = jnp.zeros((1, n_cls), x.dtype).at[0, class_idx].set(p_c)
    R = linear_relprop(R, rec["cls"], params["head"]["kernel"])
    # IndexSelect relprop scatters the cls relevance back to token 0
    # (layers.py:128-142); LayerNorm relprop is identity
    row0 = rec["nrm"][:, 0] * safe_divide(R, rec["nrm"][:, 0])
    R = jnp.zeros_like(rec["nrm"]).at[:, 0].set(row0)

    depth = len(rec["blocks"])
    attn_cams = [None] * depth
    for i in reversed(range(depth)):
        blk = rec["blocks"][i]
        p = params[f"blocks_{i}"]
        # Block.relprop (ViT.py:266-277): add2 -> mlp -> clone2
        R1, R2 = add_relprop(R, blk["x_mid"], blk["f2"])
        R2 = linear_relprop(R2, blk["g"], p["fc2"]["kernel"])
        R2 = linear_relprop(R2, blk["h2"], p["fc1"]["kernel"])  # GELU/norm id
        R = clone_relprop([R1, R2], blk["x_mid"])
        # add1 -> attention -> clone1
        R1, R2 = add_relprop(R, blk["x_in"], blk["attn_out"])
        # Attention.relprop (ViT.py:217-240)
        R2 = linear_relprop(R2, blk["proj_in"], p["proj"]["kernel"])
        b, n, dim = R2.shape
        hd = dim // heads
        cam = R2.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        cam_attn, cam_v = simple_relprop(
            lambda a, v: jnp.einsum("bhij,bhjd->bhid", a, v),
            cam, blk["attn"], blk["v"],
        )
        cam_attn = cam_attn / 2
        cam_v = cam_v / 2
        attn_cams[i] = cam_attn  # save_attn_cam happens post-halving
        # softmax relprop = identity; matmul1 Z = q k^T (unscaled)
        cam_q, cam_k = simple_relprop(
            lambda q, k: jnp.einsum("bhid,bhjd->bhij", q, k),
            cam_attn, blk["q"], blk["k"],
        )
        cam_q = cam_q / 2
        cam_k = cam_k / 2
        # einops '[q,k,v] b h n d -> b n (qkv h d)' (ViT.py:237)
        cam_qkv = jnp.stack([cam_q, cam_k, cam_v], 0)
        cam_qkv = cam_qkv.transpose(1, 3, 0, 2, 4).reshape(b, n, 3 * dim)
        R2 = linear_relprop(cam_qkv, blk["h"], p["qkv"]["kernel"])
        R = clone_relprop([R1, R2], blk["x_in"])

    if method == "rollout":
        # ViT.py:362-372: clamp the LRP attention cams, average heads
        mats = [jnp.maximum(c, 0.0).mean(1) for c in attn_cams]
        rollout = compute_rollout_attention(mats, start_layer=start_layer)
        return rollout[0, 0, 1:]
    if method in ("transformer_attribution", "grad"):
        # ViT.py:374-386: grad x cam, clamp, head-mean, rollout, cls row
        cams = []
        for i in range(depth):
            g = attn_grads[i][0]
            c = attn_cams[i][0]
            cams.append(jnp.maximum(g * c, 0.0).mean(0)[None])
        rollout = compute_rollout_attention(cams, start_layer=start_layer)
        return rollout[0, 0, 1:]
    if method == "last_layer_attn":
        # ViT.py:404-409: raw last-layer attention, head-mean, cls row
        return jnp.maximum(rec["blocks"][-1]["attn"][0], 0.0).mean(0)[0, 1:]
    raise NotImplementedError(f"relprop method {method!r}")
