"""Data loaders, utils, and training-harness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from regneuralde_tpu import data as D
from regneuralde_tpu import training as T
from regneuralde_tpu.utils import (
    AverageMeter,
    BatchedMultiVariateNormal,
    accuracy,
    loglikelihood,
    table_logger,
)


class TestLoaders:
    def test_mnist_shapes(self):
        train, test = D.load_mnist(32)
        x, y = next(iter(train))
        assert x.shape == (32, 28, 28, 1) and y.shape == (32, 10)
        assert 0.0 <= x.min() and x.max() <= 1.0
        assert np.allclose(y.sum(-1), 1.0)
        xf, _ = next(iter(D.load_mnist(16, flatten=True)[0]))
        assert xf.shape == (16, 784)

    def test_mnist_deterministic_epochs_differ(self):
        train, _ = D.load_mnist(8)
        e1 = [np.asarray(x).sum() for x, _ in train]
        e2 = [np.asarray(x).sum() for x, _ in train]
        assert not np.allclose(e1, e2)  # reshuffled between epochs

    def test_physionet_schema(self):
        train, test = D.load_physionet(16)
        batch = next(iter(train))
        assert len(batch) == 6
        od, om, dp, mp, tp, tpp = batch
        assert od.shape == (16, 49, 37) and om.shape == od.shape
        assert tp.shape == (16, 49)
        assert set(np.unique(om)) <= {0.0, 1.0}
        # masked entries are zero in the data
        assert np.allclose(od * (1 - om), 0.0)

    def test_miniboone_standardized(self):
        train, test = D.load_miniboone(64)
        x = np.concatenate([b for b in train])
        assert x.shape[1] == 43
        assert np.abs(x.mean(0)).max() < 0.2
        assert np.abs(x.std(0) - 1).max() < 0.2

    def test_spiral2d(self):
        train, test = D.load_spiral2d(8, nspiral=32, ntotal=100, nsample=20)
        s, tps = next(iter(train))
        assert s.shape == (8, 20, 2) and tps.shape == (8, 20)

    def test_gaussian_mixture(self):
        train, test = D.load_gaussian_mixture(16, nsamples=120)
        x = next(iter(train))
        assert x.shape == (16, 2)
        r = np.linalg.norm(np.concatenate([b for b in test]), axis=1)
        assert 3.0 < r.mean() < 7.0  # ring radius ~5

    def test_sde_demo(self):
        means, vars_, ts, source = D.make_sde_demo()
        assert means.shape == (30, 2) and vars_.shape == (30, 2)
        assert np.allclose(means[0], [2.0, 0.0], atol=1e-5)
        assert np.isfinite(means).all() and (vars_ >= 0).all()
        assert source == "synthetic" or source.startswith("bson:")

    def test_drop_last(self):
        dl = D.DataLoader((np.arange(10).reshape(10, 1),), 3, drop_last=True)
        assert len(dl) == 3
        assert sum(b.shape[0] for b in dl) == 9


class TestUtils:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0); m.update(3.0)
        assert m() == 2.0
        m.reset()
        assert m() == 0.0

    def test_table_logger(self, capsys):
        log = table_logger(["Epoch", "NFE"], ["Loss"])
        log(False, {"Loss": 2.0})
        log(False, {"Loss": 4.0})
        log(False, {}, 1, 120)
        log(True, {})
        out = capsys.readouterr().out
        assert "Epoch" in out and "Loss" in out
        assert "3.0000" in out  # running mean of recorded losses

    def test_mvnormal_density_and_sampling(self):
        cov = np.array([[2.0, 0.3], [0.3, 1.0]], np.float32)
        mu = np.array([1.0, -1.0], np.float32)
        mvn = BatchedMultiVariateNormal(mu, cov)
        x = jnp.asarray(np.stack([mu, mu + 1.0]).astype(np.float32))
        dens = np.asarray(mvn(x))
        from scipy.stats import multivariate_normal as sp_mvn  # noqa
        expected = sp_mvn(mu, cov).pdf(np.asarray(x))
        np.testing.assert_allclose(dens, expected, rtol=1e-3)  # f32 inv/det
        s = np.asarray(mvn.sample(jax.random.PRNGKey(0), 8192))
        np.testing.assert_allclose(s.mean(0), mu, atol=0.1)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.15)

    def test_metrics_sweeps(self):
        xs = np.random.default_rng(0).standard_normal((64, 4)).astype(np.float32)
        ys = np.zeros((64, 3), np.float32)
        ys[np.arange(64), np.abs(xs[:, :3]).argmax(-1)] = 1.0
        dl = D.DataLoader((xs, ys), 16)
        perfect = lambda p, x: jnp.abs(x[:, :3])
        assert accuracy(perfect, None, dl) == 100.0
        dl2 = D.DataLoader((xs,), 16)
        ll = loglikelihood(lambda p, x: jnp.full((x.shape[0],), -2.0), None, dl2)
        np.testing.assert_allclose(ll, -2.0, rtol=1e-6)


class TestTraining:
    def test_optimizer_registry_and_chains(self):
        import optax
        for make in (T.mnist_node_optimizer, T.latent_ode_optimizer,
                     T.mnist_nsde_optimizer, T.ffjord_optimizer,
                     T.sde_toy_optimizer):
            opt = make()
            p = {"w": jnp.ones(3)}
            state = opt.init(p)
            up, _ = opt.update({"w": jnp.ones(3)}, state, p)
            assert np.isfinite(np.asarray(up["w"])).all()

    def test_momentum_matches_flux_semantics(self):
        # Flux Momentum(eta, rho): v = rho v + eta g; p -= v.
        opt = T.momentum_sgd(0.1, 0.9)
        p = jnp.zeros(1)
        state = opt.init(p)
        g = jnp.ones(1)
        up1, state = opt.update(g, state, p)
        np.testing.assert_allclose(np.asarray(up1), -0.1, rtol=1e-6)
        up2, state = opt.update(g, state, p)
        np.testing.assert_allclose(np.asarray(up2), -(0.1 + 0.09), rtol=1e-6)

    def test_inv_decay_schedule(self):
        opt = T.inv_decay(0.5)
        p = jnp.zeros(1)
        s = opt.init(p)
        u0, s = opt.update(jnp.ones(1), s, p)
        u1, s = opt.update(jnp.ones(1), s, p)
        np.testing.assert_allclose(np.asarray(u0), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u1), 1.0 / 1.5, rtol=1e-6)

    def test_train_step_descends(self):
        def loss_fn(params, x):
            return jnp.mean((x @ params["w"]) ** 2), None

        opt = T.make_optimizer("adam", 1e-1)
        params = {"w": jnp.ones((4, 2))}
        state = T.create_train_state(params, opt)
        step = T.make_train_step(loss_fn, opt)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)),
                        jnp.float32)
        losses = []
        for _ in range(20):
            state, loss, _ = step(state, x)
            losses.append(float(loss))
        assert losses[-1] < 0.1 * losses[0]
        assert state.step == 20

    def test_multi_step_matches_sequential_single_steps(self):
        """make_multi_step(K batches per dispatch) is semantically K
        make_train_step calls: identical params, optimizer chain, losses,
        and per-step aux — the dispatch amortization must be free."""
        def loss_fn(params, x, lam):
            out = x @ params["w"]
            return jnp.mean(out**2) + lam * jnp.sum(jnp.abs(params["w"])), {
                "l2": jnp.mean(out**2)}

        opt = T.make_optimizer("adam", 1e-1)
        params = {"w": jnp.ones((4, 2))}
        rng = np.random.default_rng(1)
        K = 5
        xs = jnp.asarray(rng.standard_normal((K, 8, 4)), jnp.float32)
        lams = jnp.linspace(0.1, 0.01, K).astype(jnp.float32)

        st_a = T.create_train_state(params, opt)
        single = T.make_train_step(loss_fn, opt, nan_guard=True, donate=False)
        losses_a, l2s = [], []
        for i in range(K):
            st_a, loss, aux = single(st_a, xs[i], lams[i])
            losses_a.append(float(loss))
            l2s.append(float(aux["l2"]))

        st_b = T.create_train_state(params, opt)
        multi = T.make_multi_step(loss_fn, opt, nan_guard=True, donate=False)
        st_b, losses_b, auxs = multi(st_b, xs, lams)

        # XLA fuses the scanned body differently from the standalone step
        # (reduction order inside mean/sum), so equality is to the ulp,
        # not bitwise.
        np.testing.assert_allclose(np.asarray(losses_b),
                                   np.asarray(losses_a, np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(auxs["l2"]),
                                   np.asarray(l2s, np.float32), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                        jax.tree_util.tree_leaves(st_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
        assert int(st_b.step) == K
        assert bool(np.all(np.asarray(auxs["grads_finite"])))

    def test_multi_step_nan_guard_skips_only_poisoned_step(self):
        """A non-finite gradient at step i must skip update i but leave
        steps i+1.. running from the pre-i state."""
        def loss_fn(params, x):
            return jnp.sum(params["w"] * x), None

        opt = T.make_optimizer("sgd", 0.5)
        params = {"w": jnp.ones(3)}
        xs = jnp.stack([jnp.ones(3), jnp.full(3, jnp.nan), jnp.ones(3)])
        multi = T.make_multi_step(loss_fn, opt, nan_guard=True, donate=False)
        st, _, auxs = multi(T.create_train_state(params, opt), xs)
        # two clean sgd steps of -0.5 each; the NaN step is a no-op
        np.testing.assert_allclose(np.asarray(st.params["w"]),
                                   np.zeros(3), atol=1e-7)
        finite = np.asarray(auxs[1])
        np.testing.assert_array_equal(finite, [True, False, True])

    def test_checkpoint_roundtrip(self, tmp_path):
        ckpt = T.Checkpointer(tmp_path / "ck", save_every=2)
        params = {"w": jnp.arange(4.0)}
        assert not ckpt.maybe_save(1, params)
        assert ckpt.maybe_save(2, params, extra={"epoch": 2})
        step, payload = ckpt.restore_latest()
        assert step == 2
        np.testing.assert_allclose(np.asarray(payload["params"]["w"]),
                                   np.arange(4.0))
        ckpt.close()

    def test_config_and_run_dir(self, tmp_path):
        cfg_path = tmp_path / "c.yml"
        T.save_yaml(cfg_path, {"name": "X", "seed": 1,
                               "hyperparameters": {"batch_size": 4}})
        cfg = T.load_config(cfg_path)
        assert cfg["hyperparameters"]["batch_size"] == 4
        run = T.make_run_dir(tmp_path / "results", "exp", True, "error_est",
                             config_path=str(cfg_path))
        assert (run / "config.yml").exists()
        assert "error_est" in run.name
