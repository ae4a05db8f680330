"""MIL training-trajectory parity vs the REFERENCE'S OWN torch modules.

The GNN zoo pins training dynamics against independently written torch
twins (test_train_parity.py) because the reference models need DGL, which
is not installed. The MIL baselines need only torch, so here the oracle is
stronger: the reference's own `dsmil.MILNet`/`abmil.BClassifier`
(/root/reference/baselines/ReMix_DSMIL_ABMIL/model/{dsmil,abmil}.py) are
imported and trained EXACTLY as train_remix_k-fold.py trains them —
BCEWithLogitsLoss on one-hot bag labels (:300), for dsmil the
0.5*bag + 0.5*max-instance loss mixture (:141-145), Adam(lr, betas=(0.5,
0.9), weight_decay) (:301) with CosineAnnealingLR stepped once per epoch
to eta_min 5e-6 (:302, :362) — from weights copied out of this repo's flax
init. The flax side runs this repo's production pieces: the models in
wsi_hgnn_tpu.models.mil, train_mil.mil_reference_loss and
train_mil.cosine_epoch_schedule, and the exact optax chain
run_bag_models.make_tx builds (train_mil.py:212-221), on PADDED bags with
masks. Lockstep loss trajectories + final parameters == the AUC a
data-holding user measures is the reference's.
"""
import importlib.util
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import train_mil
from wsi_hgnn_tpu.models.mil import ABMIL, DSMIL

REF_DIR = "/root/reference/baselines/ReMix_DSMIL_ABMIL/model"

D, C = 16, 2
LR, WD, EPOCHS = 2e-4, 5e-3, 5


def _load_ref(name):
    path = os.path.join(REF_DIR, f"{name}.py")
    if not os.path.exists(path):
        pytest.skip("reference ReMix_DSMIL_ABMIL not available")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bags(seed=41):
    rng = np.random.RandomState(seed)
    sizes = (10, 7, 12, 9)
    bags = [rng.randn(n, D).astype(np.float32) for n in sizes]
    labels = np.array([0, 1, 1, 0], np.int64)
    return bags, labels


def _pad(bag, cap):
    mask = np.zeros(cap, bool)
    mask[: len(bag)] = True
    out = np.zeros((cap, D), np.float32)
    out[: len(bag)] = bag
    return jnp.asarray(out), jnp.asarray(mask)


def _make_tx(steps_per_epoch):
    """The exact chain run_bag_models.make_tx builds (train_mil.py:212-221)."""
    import optax

    lr_of = train_mil.cosine_epoch_schedule(LR, EPOCHS, steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(WD),
        optax.scale_by_adam(b1=0.5, b2=0.9),
        optax.scale_by_schedule(lambda c: -lr_of(c)),
    )


def _train_flax(model_name, model, loss_of):
    """Per-bag steps over EPOCHS epochs, exactly like run_bag_models."""
    import optax

    bags, labels = _bags()
    cap = max(len(b) for b in bags)
    padded = [_pad(b, cap) for b in bags]
    params = model.init(jax.random.PRNGKey(37), padded[0][0], padded[0][1])

    tx = _make_tx(steps_per_epoch=len(bags))

    @jax.jit
    def step(params, opt_state, feats, mask, label):
        loss, grads = jax.value_and_grad(loss_of)(params, feats, mask, label)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    init = jax.tree.map(np.asarray, params)
    opt_state = tx.init(params)
    losses = []
    for _ in range(EPOCHS):
        for (feats, mask), label in zip(padded, labels):
            params, opt_state, loss = step(params, opt_state, feats, mask,
                                           int(label))
            losses.append(float(loss))
    return init, jax.tree.map(np.asarray, params), np.array(losses)


def _train_torch(milnet, model_name):
    """train_remix_k-fold.py:125-155 + :300-302 + :362, verbatim semantics."""
    bags, labels = _bags()
    criterion = torch.nn.BCEWithLogitsLoss()
    opt = torch.optim.Adam(milnet.parameters(), lr=LR, betas=(0.5, 0.9),
                           weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, EPOCHS, 5e-6)
    losses = []
    milnet.train()
    for _ in range(EPOCHS):
        for bag, label in zip(bags, labels):
            opt.zero_grad()
            feats = torch.from_numpy(bag)
            onehot = torch.zeros(1, C)
            onehot[0, int(label)] = 1.0
            if model_name == "dsmil":
                ins, bag_pred, _, _ = milnet(feats)
                max_pred, _ = torch.max(ins, 0)
                loss = 0.5 * criterion(bag_pred.view(1, -1), onehot) \
                    + 0.5 * criterion(max_pred.view(1, -1), onehot)
            else:
                bag_pred = milnet(feats)
                loss = criterion(bag_pred.view(1, -1), onehot)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        sched.step()
    return np.array(losses)


def _copy(dst_param, arr, transpose=False):
    a = np.asarray(arr)
    with torch.no_grad():
        dst_param.copy_(torch.from_numpy(a.T.copy() if transpose else a.copy()))


def test_dsmil_trajectory_matches_reference_torch():
    """DSMIL: this repo's padded-bag model + train_mil loss/schedule/optax
    chain trains in lockstep with the reference's own MILNet + torch.optim
    from identical weights (critical-instance selection, shared-q attention,
    the Conv1d bag head, and the 0.5/0.5 loss mixture all under grad)."""
    dsmil = _load_ref("dsmil")
    model = DSMIL(num_classes=C)

    def loss_of(params, feats, mask, label):
        onehot = jax.nn.one_hot(label, C)[None]
        classes, bag, _, _ = model.apply(params, feats, mask, train=False)
        masked = jnp.where(mask[:, None], classes, -1e30)
        return train_mil.mil_reference_loss(
            "dsmil", bag, masked.max(0, keepdims=True), onehot)

    init, fin, j_losses = _train_flax("dsmil", model, loss_of)

    milnet = dsmil.MILNet(
        dsmil.FCLayer(in_size=D, out_size=C),
        dsmil.BClassifier(input_size=D, output_class=C, dropout_v=0),
    )
    ip = init["params"]
    _copy(milnet.i_classifier.fc[0].weight, ip["i_classifier"]["fc"]["kernel"],
          transpose=True)
    _copy(milnet.i_classifier.fc[0].bias, ip["i_classifier"]["fc"]["bias"])
    _copy(milnet.b_classifier.q.weight, ip["b_classifier"]["q"]["kernel"],
          transpose=True)
    _copy(milnet.b_classifier.q.bias, ip["b_classifier"]["q"]["bias"])
    _copy(milnet.b_classifier.v[1].weight, ip["b_classifier"]["v"]["kernel"],
          transpose=True)
    _copy(milnet.b_classifier.v[1].bias, ip["b_classifier"]["v"]["bias"])
    _copy(milnet.b_classifier.fcc.weight, ip["b_classifier"]["fcc_kernel"])
    _copy(milnet.b_classifier.fcc.bias, ip["b_classifier"]["fcc_bias"])

    t_losses = _train_torch(milnet, "dsmil")
    assert j_losses[-1] < j_losses[0], "no learning signal"
    np.testing.assert_allclose(j_losses, t_losses, atol=1e-5, rtol=1e-4)

    fparams = fin["params"]
    with torch.no_grad():
        np.testing.assert_allclose(
            fparams["i_classifier"]["fc"]["kernel"],
            milnet.i_classifier.fc[0].weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="i_classifier fc diverged")
        np.testing.assert_allclose(
            fparams["b_classifier"]["q"]["kernel"],
            milnet.b_classifier.q.weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="b_classifier q diverged")
        np.testing.assert_allclose(
            fparams["b_classifier"]["v"]["kernel"],
            milnet.b_classifier.v[1].weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="b_classifier v diverged")
        np.testing.assert_allclose(
            fparams["b_classifier"]["fcc_kernel"],
            milnet.b_classifier.fcc.weight.numpy(), atol=1e-5, rtol=0,
            err_msg="fcc kernel diverged")


def _dense_mincut_torch(x, adj, s, mask):
    """torch_geometric's dense_mincut_pool restated densely (the one
    component of the GTNMIL Classifier whose reference implementation
    needs torch_geometric, GraphTransformer.py:16,:65); numerically
    mirrors models/mil/graph_transformer.dense_mincut_pool."""
    s = torch.softmax(s, dim=-1) * mask.unsqueeze(2)
    x_p = s.transpose(1, 2) @ x
    adj_p = s.transpose(1, 2) @ adj @ s
    num = torch.einsum("bkk->b", adj_p)
    deg = adj.sum(-1)
    den = torch.einsum("bnk,bn,bnk->b", s, deg, s)
    mincut = -(num / den.clamp_min(1e-12)).mean()
    ss = s.transpose(1, 2) @ s
    k = s.shape[-1]
    ss_n = torch.linalg.matrix_norm(ss).clamp_min(1e-12)
    eye = torch.eye(k) / k ** 0.5
    ortho = torch.linalg.matrix_norm(
        ss / ss_n[:, None, None] - eye).mean()
    d = torch.einsum("bkk->bk", adj_p)
    adj_p = adj_p - torch.diag_embed(d)
    inv = adj_p.sum(-1).clamp_min(1e-12).rsqrt()
    adj_p = adj_p * inv.unsqueeze(-1) * inv.unsqueeze(1)
    return x_p, adj_p, mincut, ortho


def test_gtn_trajectory_matches_reference_torch(monkeypatch):
    """GTNMIL Classifier training parity. The torch oracle is assembled
    from the reference's OWN modules — gcn.GCNBlock (bn=1, add_self=1,
    normalize=1, relu=0; .cuda() patched out) and ViT.VisionTransformer
    (loaded and weight-copied exactly as test_relprop does) — glued per
    GraphTransformer.py:39-77 with only dense_mincut_pool restated. Both
    stacks train per-bag with CE + mincut + ortho loss and Adam(wd 5e-4)
    under the epoch-pinned cosine LR (main_kfold.py:118-120; the
    reference's scheduler.step(epoch) mid-loop pins each epoch's LR to
    cosine(epoch) — train_mil.cosine_epoch_schedule's documented
    semantics, applied on the torch side as a closed-form per-epoch lr
    set). Pins the mincut/ortho gradients, the masked-BN dynamics inside
    GCNBlock, and the transformer under training — lockstep."""
    import sys
    import types

    pytest.importorskip("einops")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    ref_models = "/root/reference/baselines/GTNMIL/models"
    if not os.path.isdir(ref_models):
        pytest.skip("reference GTNMIL not available")
    if "refgtnm" not in sys.modules:
        pkg = types.ModuleType("refgtnm")
        pkg.__path__ = [ref_models]
        sys.modules["refgtnm"] = pkg
    import importlib

    ref_gcn = importlib.import_module("refgtnm.gcn")
    ViT = importlib.import_module("refgtnm.ViT")
    from test_relprop import _copy_to_torch

    from wsi_hgnn_tpu.models.mil import GraphTransformer

    EMBED, DEPTH, CLUSTERS, DIN = 16, 3, 8, 8
    LR_G, WD_G, EPOCHS_G = 1e-3, 5e-4, 4

    rng = np.random.RandomState(51)
    sizes = (10, 7, 12, 9)
    cap = max(sizes)
    bags, adjs, labels = [], [], np.array([0, 1, 1, 0], np.int64)
    for n in sizes:
        bags.append(rng.randn(n, DIN).astype(np.float32))
        a = (rng.rand(n, n) < 0.3).astype(np.float32)
        np.fill_diagonal(a, 0.0)
        adjs.append(a)

    model = GraphTransformer(n_class=C, in_dim=DIN, embed_dim=EMBED,
                             node_cluster_num=CLUSTERS, depth=DEPTH)

    def padded(i):
        f = np.zeros((cap, DIN), np.float32)
        f[: sizes[i]] = bags[i]
        a = np.zeros((cap, cap), np.float32)
        a[: sizes[i], : sizes[i]] = adjs[i]
        m = np.zeros(cap, np.float32)
        m[: sizes[i]] = 1.0
        return (jnp.asarray(f[None]), jnp.asarray(a[None]),
                jnp.asarray(m[None]))

    variables = model.init(jax.random.PRNGKey(43), *padded(0))
    params, bstats = variables["params"], variables["batch_stats"]
    init = jax.tree.map(np.asarray, params)

    import optax

    lr_of = train_mil.cosine_epoch_schedule(LR_G, EPOCHS_G, len(bags))
    tx = optax.chain(
        optax.add_decayed_weights(WD_G),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda c: -lr_of(c)),
    )

    @jax.jit
    def step(params, bstats, opt_state, feats, adj, mask, label):
        def loss_fn(p):
            (logits, aux), upd = model.apply(
                {"params": p, "batch_stats": bstats}, feats, adj, mask,
                train=True, mutable=["batch_stats"],
            )
            return (-jax.nn.log_softmax(logits)[0, label] + aux,
                    upd["batch_stats"])

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    opt_state = tx.init(params)
    j_losses = []
    for _ in range(EPOCHS_G):
        for i in range(len(bags)):
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, *padded(i), int(labels[i]))
            j_losses.append(float(loss))

    # ---- the reference-module oracle
    conv1 = ref_gcn.GCNBlock(DIN, EMBED, 1, 1, 1, 0.0, 0)
    pool1 = torch.nn.Linear(EMBED, CLUSTERS)
    cls_token = torch.nn.Parameter(
        torch.from_numpy(np.asarray(init["cls_token"]).copy()))
    vt = _copy_to_torch(torch, ViT, init)
    vt.train()
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(
            np.asarray(init["conv1"]["weight"]["kernel"]).copy()))
        conv1.bias.copy_(torch.from_numpy(
            np.asarray(init["conv1"]["weight"]["bias"]).copy()))
        conv1.bn_layer.weight.copy_(torch.from_numpy(
            np.asarray(init["conv1"]["bn"]["scale"]).copy()))
        conv1.bn_layer.bias.copy_(torch.from_numpy(
            np.asarray(init["conv1"]["bn"]["bias"]).copy()))
        pool1.weight.copy_(torch.from_numpy(
            np.asarray(init["pool1"]["kernel"]).T.copy()))
        pool1.bias.copy_(torch.from_numpy(
            np.asarray(init["pool1"]["bias"]).copy()))
    conv1.train()

    all_params = (list(conv1.parameters()) + list(pool1.parameters())
                  + [cls_token] + list(vt.parameters()))
    opt = torch.optim.Adam(all_params, lr=LR_G, weight_decay=WD_G)

    def torch_forward(i):
        x = torch.from_numpy(bags[i][None])
        adj = torch.from_numpy(adjs[i][None])
        m = torch.ones(1, sizes[i])
        X = m.unsqueeze(2) * x
        X = conv1(X, adj, m)
        s = pool1(X)
        X, _, mc1, o1 = _dense_mincut_torch(X, adj, s, m)
        X = torch.cat([cls_token.repeat(1, 1, 1), X], dim=1)
        out = vt(X)
        label = torch.from_numpy(labels[i : i + 1])
        return torch.nn.functional.cross_entropy(out, label) + mc1 + o1

    t_losses = []
    for e in range(EPOCHS_G):
        # main_kfold's scheduler.step(epoch) pins epoch e to cosine(e)
        lr_e = 5e-6 + (LR_G - 5e-6) * (1 + math.cos(math.pi * e / EPOCHS_G)) / 2
        for group in opt.param_groups:
            group["lr"] = lr_e
        for i in range(len(bags)):
            opt.zero_grad()
            loss = torch_forward(i)
            loss.backward()
            opt.step()
            t_losses.append(float(loss.detach()))

    j, t = np.array(j_losses), np.array(t_losses)
    assert j[-1] < j[0], "no learning signal"
    np.testing.assert_allclose(j, t, atol=3e-4, rtol=3e-4)
    fparams = jax.tree.map(np.asarray, params)
    with torch.no_grad():
        np.testing.assert_allclose(
            fparams["conv1"]["weight"]["kernel"],
            conv1.weight.detach().numpy(), atol=1e-4, rtol=0,
            err_msg="conv1 weight diverged")
        np.testing.assert_allclose(
            fparams["pool1"]["kernel"], pool1.weight.detach().numpy().T,
            atol=1e-4, rtol=0, err_msg="pool1 diverged")
        np.testing.assert_allclose(
            fparams["cls_token"], cls_token.detach().numpy(), atol=1e-4,
            rtol=0, err_msg="cls_token diverged")
        np.testing.assert_allclose(
            fparams["blocks_0"]["qkv"]["kernel"],
            vt.blocks[0].attn.qkv.weight.detach().numpy().T, atol=1e-4,
            rtol=0, err_msg="block 0 qkv diverged")
        np.testing.assert_allclose(
            fparams["head"]["kernel"], vt.head.weight.detach().numpy().T,
            atol=1e-4, rtol=0, err_msg="head diverged")
    fbs = jax.tree.map(np.asarray, bstats)
    np.testing.assert_allclose(
        fbs["conv1"]["bn"]["mean"],
        conv1.bn_layer.running_mean.detach().numpy(), atol=3e-4, rtol=0,
        err_msg="conv1 BN running_mean diverged")


def test_abmil_trajectory_matches_reference_torch():
    """ABMIL: linear-ReLU-linear attention + softmax-weighted bag pooling
    trains in lockstep with the reference's own abmil.BClassifier."""
    abmil = _load_ref("abmil")
    model = ABMIL(num_classes=C)

    def loss_of(params, feats, mask, label):
        onehot = jax.nn.one_hot(label, C)[None]
        bag = model.apply(params, feats, mask)
        return train_mil.mil_reference_loss("abmil", bag, bag, onehot)

    init, fin, j_losses = _train_flax("abmil", model, loss_of)

    milnet = abmil.BClassifier(D, C)
    ip = init["params"]
    _copy(milnet.attention[0].weight, ip["attention_0"]["kernel"],
          transpose=True)
    _copy(milnet.attention[0].bias, ip["attention_0"]["bias"])
    _copy(milnet.attention[2].weight, ip["attention_1"]["kernel"],
          transpose=True)
    _copy(milnet.attention[2].bias, ip["attention_1"]["bias"])
    _copy(milnet.classifier[0].weight, ip["classifier"]["kernel"],
          transpose=True)
    _copy(milnet.classifier[0].bias, ip["classifier"]["bias"])

    t_losses = _train_torch(milnet, "abmil")
    assert j_losses[-1] < j_losses[0], "no learning signal"
    np.testing.assert_allclose(j_losses, t_losses, atol=1e-5, rtol=1e-4)

    fparams = fin["params"]
    with torch.no_grad():
        np.testing.assert_allclose(
            fparams["attention_0"]["kernel"],
            milnet.attention[0].weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="attention_0 diverged")
        np.testing.assert_allclose(
            fparams["attention_1"]["kernel"],
            milnet.attention[2].weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="attention_1 diverged")
        np.testing.assert_allclose(
            fparams["classifier"]["kernel"],
            milnet.classifier[0].weight.numpy().T, atol=1e-5, rtol=0,
            err_msg="classifier diverged")
