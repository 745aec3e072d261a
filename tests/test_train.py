"""End-to-end training-step tests: loss computation, gradient flow, and
data-parallel sharding over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orientedreppoints_tpu.core.loss_head import LossConfig, compute_losses
from orientedreppoints_tpu.models import OrientedRepPointsDetector
from orientedreppoints_tpu.parallel import (
    TrainState,
    build_optimizer,
    lr_schedule,
    make_train_step,
)

IMG = 128
MAX_GT = 8


def make_batch(rng, b):
    imgs = rng.rand(b, IMG, IMG, 3).astype(np.float32)
    gt_polys = np.zeros((b, MAX_GT, 8), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int32)
    gt_valid = np.zeros((b, MAX_GT), bool)
    for i in range(b):
        n = rng.randint(1, 4)
        for j in range(n):
            cx, cy = rng.rand(2) * 80 + 24
            w, h = rng.rand(2) * 40 + 10
            a = rng.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            r = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
            gt_polys[i, j] = ((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
            gt_labels[i, j] = rng.randint(1, 16)
            gt_valid[i, j] = True
    return {
        "images": jnp.asarray(imgs),
        "gt_polys": jnp.asarray(gt_polys),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
        "img_hw": jnp.full((b, 2), IMG, jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    model = OrientedRepPointsDetector(depth=18, num_classes=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    cfg = LossConfig(max_pos=64)
    return model, variables, cfg


class TestLosses:
    # one jitted (apply, loss) pair shared by every same-shape test in the
    # class: a single compile, persisted in the compile cache across runs
    @pytest.fixture(scope="class")
    def jitted(self, setup):
        model, variables, cfg = setup
        apply = jax.jit(model.apply)
        loss = jax.jit(
            lambda o, b: compute_losses(
                o, b["gt_polys"], b["gt_labels"], b["gt_valid"],
                b["img_hw"], cfg,
            )
        )
        return apply, loss

    def test_loss_values_finite(self, setup, jitted, rng):
        model, variables, cfg = setup
        apply, loss = jitted
        batch = make_batch(rng, 2)
        losses = loss(apply(variables, batch["images"]), batch)
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert float(losses["num_pos"]) > 0
        assert float(losses["loss_cls"]) > 0
        assert float(losses["loss_rbox_refine"]) > 0

    def test_empty_gt_image(self, setup, jitted, rng):
        model, variables, cfg = setup
        apply, loss = jitted
        batch = make_batch(rng, 2)
        batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
        losses = loss(apply(variables, batch["images"]), batch)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["num_pos"]) == 0
        assert float(losses["loss_cls"]) == 0  # reference zeroes on no pos

    def test_init_loss_pos_num_gt1_padding_invariant(self, setup):
        """With init_assign_pos_num>1 a level can hold pos_num*G positives;
        the init-loss compaction must size its top-k accordingly (ADVICE r2:
        k = max_gt alone silently drops positive rows), so the loss must not
        change with the gt-padding width."""
        model, variables, _ = setup
        cfg = LossConfig(max_pos=64, init_assign_pos_num=4)
        centers = [(28, 28), (28, 96), (96, 28), (96, 96)]

        def make(max_gt):
            polys = np.zeros((1, max_gt, 8), np.float32)
            labels = np.zeros((1, max_gt), np.int32)
            valid = np.zeros((1, max_gt), bool)
            for j, (cx, cy) in enumerate(centers):
                r = np.array(
                    [[-12, -12], [12, -12], [12, 12], [-12, 12]], np.float32
                )
                polys[0, j] = (r + [cx, cy]).reshape(-1)
                labels[0, j] = j + 1
                valid[0, j] = True
            return jnp.asarray(polys), jnp.asarray(labels), jnp.asarray(valid)

        imgs = jnp.asarray(
            np.random.RandomState(3).rand(1, IMG, IMG, 3).astype(np.float32)
        )
        outs = jax.jit(model.apply)(variables, imgs)
        hw = jnp.full((1, 2), IMG, jnp.int32)
        # jitted (not eager): the graph lands in the persistent compile
        # cache, so repeat suite runs skip the compile entirely
        loss_fn = jax.jit(
            lambda o, p, l, v: compute_losses(o, p, l, v, hw, cfg)
        )
        vals = []
        for max_gt in (4, 16):
            p, l, v = make(max_gt)
            losses = loss_fn(outs, p, l, v)
            vals.append({k: float(x) for k, x in losses.items()})
        for k in vals[0]:
            assert abs(vals[0][k] - vals[1][k]) < 1e-5, (
                k, vals[0][k], vals[1][k])
        assert vals[0]["loss_rbox_init"] > 0

    def test_grads_flow(self, setup, rng):
        model, variables, cfg = setup
        batch = make_batch(rng, 1)

        def loss_fn(params):
            outs = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["images"],
            )
            losses = compute_losses(
                outs, batch["gt_polys"], batch["gt_labels"],
                batch["gt_valid"], batch["img_hw"], cfg,
            )
            return sum(v for k, v in losses.items() if k.startswith("loss"))

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        nonzero = 0
        for path, g in flat:
            assert np.all(np.isfinite(np.asarray(g))), path
            if np.any(np.asarray(g) != 0):
                nonzero += 1
        # the vast majority of parameters must receive gradient
        assert nonzero > 0.8 * len(flat)


class TestTrainStep:
    def test_mesh_train_step(self, setup, rng):
        model, variables, cfg = setup
        # fresh copies: the train step donates its input state
        params = jax.tree.map(jnp.copy, variables["params"])
        assert len(jax.devices()) == 8
        mesh = Mesh(np.array(jax.devices()), ("data",))
        sched = lr_schedule(iters_per_epoch=10)
        tx = build_optimizer(params, sched)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params),
            tx=tx,
        )
        step_fn = make_train_step(model, cfg, mesh=mesh)
        batch = make_batch(rng, 8)
        p0 = np.asarray(jax.tree.leaves(state.params)[0])  # before donation
        state2, losses = step_fn(state, batch)
        assert int(state2.step) == 1
        assert np.isfinite(float(losses["loss_total"]))
        # params actually changed
        p1 = np.asarray(jax.tree.leaves(state2.params)[0])
        assert not np.allclose(p0, p1)

    def test_dp_loss_invariance(self, setup, rng):
        """8-way data-parallel sharded loss == single-device loss on the
        identical global batch (psum'd shard-mean vs local mean)."""
        model, variables, cfg = setup

        def fresh_state():
            params = jax.tree.map(jnp.copy, variables["params"])
            tx = build_optimizer(params, lr_schedule(iters_per_epoch=10))
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                batch_stats=jax.tree.map(jnp.copy,
                                         variables["batch_stats"]),
                opt_state=tx.init(params), tx=tx,
            )

        batch = make_batch(rng, 8)
        mesh = Mesh(np.array(jax.devices()), ("data",))
        _, losses_dp = make_train_step(model, cfg, mesh=mesh)(
            fresh_state(), {k: jnp.copy(v) for k, v in batch.items()})
        _, losses_1 = make_train_step(model, cfg)(
            fresh_state(), {k: jnp.copy(v) for k, v in batch.items()})
        for k in losses_1:
            a, b = float(losses_dp[k]), float(losses_1[k])
            assert abs(a - b) <= 2e-5 * max(1.0, abs(b)), (k, a, b)

    def test_frozen_params_not_updated(self, setup, rng):
        from orientedreppoints_tpu.parallel.train import (
            default_frozen_prefixes,
        )
        model, variables, cfg = setup
        params = jax.tree.map(jnp.copy, variables["params"])
        sched = lr_schedule(iters_per_epoch=10)
        tx = build_optimizer(
            params, sched,
            frozen_prefixes=default_frozen_prefixes(1),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params),
            tx=tx,
        )
        step_fn = make_train_step(model, cfg)
        batch = make_batch(rng, 1)
        stem0 = np.asarray(state.params["backbone"]["stem"]["conv"]["kernel"])
        l1_0 = np.asarray(
            state.params["backbone"]["layer1_0"]["conv1"]["conv"]["kernel"]
        )
        l2_0 = np.asarray(
            state.params["backbone"]["layer2_0"]["conv1"]["conv"]["kernel"]
        )
        state2, _ = step_fn(state, batch)
        stem1 = state2.params["backbone"]["stem"]["conv"]["kernel"]
        np.testing.assert_array_equal(stem0, np.asarray(stem1))
        l1_1 = state2.params["backbone"]["layer1_0"]["conv1"]["conv"]["kernel"]
        np.testing.assert_array_equal(l1_0, np.asarray(l1_1))
        # non-frozen stage did update
        l2_1 = state2.params["backbone"]["layer2_0"]["conv1"]["conv"]["kernel"]
        assert not np.allclose(l2_0, np.asarray(l2_1))


class TestDropPath:
    """Stochastic depth must actually fire in training (VERDICT weak #2)."""

    TINY_SWIN = dict(embed_dim=24, depths=(1, 1), num_heads=(2, 2),
                     out_indices=(0, 1), drop_path_rate=0.5, window_size=4)

    def test_swin_drop_path_stochastic(self, rng):
        from orientedreppoints_tpu.models.swin import SwinTransformer
        m = SwinTransformer(**self.TINY_SWIN)
        x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        det = m.apply(v, x, True)
        # deterministic path ignores rngs and is reproducible
        det2 = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
        for a, b in zip(det, det2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training path: different dropout rngs -> different activations
        s1 = m.apply(v, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
        s2 = m.apply(v, x, False, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(s1[-1]), np.asarray(s2[-1]))
        # and differs from the deterministic output
        assert not np.allclose(np.asarray(s1[-1]), np.asarray(det[-1]))

    def test_train_step_threads_dropout_rng(self, rng):
        """Two train steps that differ ONLY in the dropout base rng give
        different losses for a drop-path>0 Swin detector, and identical
        losses for a deterministic ResNet."""
        batch = make_batch(rng, 2)
        batch["images"] = batch["images"][:, :64, :64]
        batch["img_hw"] = jnp.full((2, 2), 64, jnp.int32)
        cfg = LossConfig(max_pos=32)

        def loss_with_rng(model, key):
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            params = jax.tree.map(jnp.copy, variables["params"])
            tx = build_optimizer(params, lr_schedule(iters_per_epoch=10))
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                batch_stats=jax.tree.map(
                    jnp.copy, variables.get("batch_stats", {})),
                opt_state=tx.init(params), tx=tx,
            )
            step_fn = make_train_step(model, cfg,
                                      dropout_rng=jax.random.key(key))
            _, losses = step_fn(state, batch)
            return float(losses["loss_total"])

        swin = OrientedRepPointsDetector(
            backbone_type="swin", num_classes=16, num_levels=5,
            backbone_kwargs=self.TINY_SWIN,
        )
        l1 = loss_with_rng(swin, 1)
        l2 = loss_with_rng(swin, 2)
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l1 != l2, "drop-path did not fire in the train step"

        resnet = OrientedRepPointsDetector(depth=18, num_classes=16)
        r1 = loss_with_rng(resnet, 1)
        r2 = loss_with_rng(resnet, 2)
        assert r1 == r2, "deterministic backbone loss changed with rng"


class TestSchedule:
    def test_lr_schedule(self):
        sched = lr_schedule(base_lr=0.008, iters_per_epoch=100)
        assert float(sched(jnp.asarray(0))) == pytest.approx(0.008 / 3)
        assert float(sched(jnp.asarray(500))) == pytest.approx(0.008)
        assert float(sched(jnp.asarray(2399))) == pytest.approx(0.008)
        assert float(sched(jnp.asarray(2400))) == pytest.approx(0.0008)
        assert float(sched(jnp.asarray(3200))) == pytest.approx(8e-5)
        assert float(sched(jnp.asarray(3800))) == pytest.approx(8e-6)


class TestDeviceNormalize:
    """Device-side Normalize (uint8 feed) ≡ host Normalize + zero pad."""

    MEAN = (123.675, 116.28, 103.53)
    STD = (58.395, 57.12, 57.375)

    def _raw_batch(self, rng, b=2, content=96):
        batch = make_batch(rng, b)
        raw = (rng.rand(b, IMG, IMG, 3) * 255).astype(np.uint8)
        raw[:, content:] = 0
        raw[:, :, content:] = 0
        batch["img_hw"] = jnp.full((b, 2), content, jnp.int32)
        return batch, raw

    def _host_normalize(self, raw, content):
        x = raw.astype(np.float32)[..., ::-1]
        x = (x - np.asarray(self.MEAN, np.float32)) / np.asarray(
            self.STD, np.float32)
        x[:, content:] = 0
        x[:, :, content:] = 0
        return x

    def test_device_normalize_matches_host(self):
        from orientedreppoints_tpu.parallel.train import device_normalize

        rng = np.random.RandomState(7)
        _, raw = self._raw_batch(rng)
        got = np.asarray(device_normalize(
            jnp.asarray(raw), jnp.full((2, 2), 96, jnp.int32),
            self.MEAN, self.STD, to_rgb=True))
        np.testing.assert_allclose(got, self._host_normalize(raw, 96),
                                   rtol=0, atol=1e-5)

    def test_train_step_uint8_feed_equals_host_path(self, setup):
        model, variables, cfg = setup
        rng = np.random.RandomState(8)
        batch, raw = self._raw_batch(rng)
        tx = build_optimizer(variables["params"], lr_schedule())

        def state():
            # fresh device copies: the jitted step donates the state
            # buffers, so each invocation needs its own arrays
            params = jax.tree.map(jnp.array, variables["params"])
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=jax.tree.map(
                    jnp.array, variables.get("batch_stats", {})),
                opt_state=tx.init(params),
                tx=tx,
            )

        host_batch = dict(batch, images=jnp.asarray(
            self._host_normalize(raw, 96)))
        _, host_losses = make_train_step(model, cfg)(state(), host_batch)

        dev_batch = dict(batch, images=jnp.asarray(raw))
        _, dev_losses = make_train_step(
            model, cfg,
            img_norm=dict(mean=self.MEAN, std=self.STD, to_rgb=True),
        )(state(), dev_batch)

        for k in host_losses:
            np.testing.assert_allclose(
                float(host_losses[k]), float(dev_losses[k]),
                rtol=1e-5, atol=1e-6, err_msg=k)

    def test_builder_wires_device_normalize(self, tmp_path):
        from orientedreppoints_tpu.utils import Config, builder

        cfg = Config.fromfile("configs/dota/synth_r18_512.py")
        assert builder.build_img_norm(cfg) is None  # flag off by default
        cfg.tpu["device_normalize"] = True
        norm = builder.build_img_norm(cfg)
        assert norm is not None and len(norm["mean"]) == 3

        from orientedreppoints_tpu.data.pipelines import build_pipeline

        steps = [dict(s, device=True) if s.get("type") == "Normalize" else s
                 for s in cfg.data["train"]["pipeline"]]
        pipe = build_pipeline(steps)
        # a uint8 image must survive the deferred Normalize untouched
        from orientedreppoints_tpu.data.pipelines import Normalize

        n = Normalize(norm["mean"], norm["std"], device=True)
        img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(
            np.uint8)
        out = n({"img": img})
        assert out["img"].dtype == np.uint8
        assert "img_norm_cfg" in out
