"""Model layer: shapes, init statistics, and agent update mechanics."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import (
    NetConfig,
    PPOConfig,
    SACConfig,
    actor_net_config,
    critic_net_config,
)
from hope_tpu.models import Critic, MultiObsEmbedding


def _obs(b=2, with_img=True):
    o = {
        "lidar": jnp.ones((b, 120)) * 0.5,
        "target": jnp.ones((b, 5)) * 0.1,
        "action_mask": jnp.ones((b, 42)),
    }
    if with_img:
        o["img"] = jnp.zeros((b, 3, 64, 64))
    return o


def test_actor_forward_shapes():
    cfg = actor_net_config()
    net = MultiObsEmbedding(cfg)
    params = net.init(jax.random.PRNGKey(0), _obs())
    out = net.apply(params, _obs(3))
    assert out.shape == (3, 2)
    assert (jnp.abs(out) <= 1.0).all()  # tanh output


def test_critic_with_action_modality():
    cfg = critic_net_config(action_input=True)
    net = Critic(cfg)
    params = net.init(jax.random.PRNGKey(0), _obs(), jnp.zeros((2, 2)))
    q = net.apply(params, _obs(4), jnp.zeros((4, 2)))
    assert q.shape == (4, 1)


def test_param_count_reasonable():
    cfg = actor_net_config()
    net = MultiObsEmbedding(cfg)
    params = net.init(jax.random.PRNGKey(0), _obs())
    n = sum(x.size for x in jax.tree.leaves(params))
    # reference-scale model: ~1M params (embeds + depth-1 transformer + conv)
    assert 2e5 < n < 5e6, n


def test_orthogonal_init_gain():
    cfg = NetConfig(img_shape=None, action_mask_dim=None)
    net = MultiObsEmbedding(cfg)
    obs = {"lidar": jnp.zeros((1, 120)), "target": jnp.zeros((1, 5))}
    params = net.init(jax.random.PRNGKey(1), obs)
    w = np.asarray(params["params"]["embed_lidar"]["Dense_0"]["kernel"])
    # semi-orthogonal: the smaller-dimension Gram matrix is the identity
    gram = w @ w.T if w.shape[0] <= w.shape[1] else w.T @ w
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)


def test_sac_update_moves_params():
    from hope_tpu.agents import SACAgent

    obs_shape = {"lidar": (120,), "target": (5,), "action_mask": (42,)}
    agent = SACAgent(
        actor_net_config(_no_img()), critic_net_config(_no_img(), action_input=True),
        SACConfig(), obs_shape,
    )
    st = agent.init(jax.random.PRNGKey(0))
    B = 8
    batch = {
        "obs/lidar": jnp.ones((B, 120)), "obs/target": jnp.ones((B, 5)),
        "obs/action_mask": jnp.ones((B, 42)),
        "next_obs/lidar": jnp.ones((B, 120)), "next_obs/target": jnp.ones((B, 5)),
        "next_obs/action_mask": jnp.ones((B, 42)),
        "action": jnp.zeros((B, 2)), "reward": jnp.ones(B),
        "done": jnp.zeros(B, bool),
    }
    st2, m = agent.update(st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["actor_loss"]))
    assert np.isfinite(float(m["critic_loss"]))
    # params actually moved
    d = jax.tree.map(lambda a, b: jnp.abs(a - b).max(), st.critic1, st2.critic1)
    assert max(float(x) for x in jax.tree.leaves(d)) > 0
    # targets moved a little (Polyak), much less than critics
    dt = jax.tree.map(lambda a, b: jnp.abs(a - b).max(), st.target1, st2.target1)
    assert 0 < max(float(x) for x in jax.tree.leaves(dt))


def test_ppo_update_runs():
    from hope_tpu.agents import PPOAgent

    obs_shape = {"lidar": (120,), "target": (5,), "action_mask": (42,)}
    agent = PPOAgent(
        actor_net_config(_no_img()),
        critic_net_config(_no_img(), action_input=False),
        PPOConfig(mini_epoch=2, mini_batch=8), obs_shape,
    )
    st = agent.init(jax.random.PRNGKey(0))
    T = 32
    batch = {
        "obs/lidar": jnp.ones((T, 120)), "obs/target": jnp.ones((T, 5)),
        "obs/action_mask": jnp.ones((T, 42)),
        "next_obs/lidar": jnp.ones((T, 120)), "next_obs/target": jnp.ones((T, 5)),
        "next_obs/action_mask": jnp.ones((T, 42)),
        "action": jnp.zeros((T, 2)), "reward": jnp.ones(T),
        "done": jnp.zeros(T, bool), "log_prob": jnp.zeros(T),
    }
    st2, m = agent.update(st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["actor_loss"]))


def test_welford_state_norm(rng):
    from hope_tpu.agents import NormState, norm_update, normalize

    st = NormState.create({"lidar": (4,), "target": (2,)})
    xs = rng.standard_normal((100, 4)) * 3 + 1
    ts = rng.standard_normal((100, 2))
    for i in range(0, 100, 10):
        st = norm_update(st, {"lidar": jnp.asarray(xs[i:i+10]),
                              "target": jnp.asarray(ts[i:i+10])})
    np.testing.assert_allclose(np.asarray(st.mean["lidar"]), xs.mean(0), rtol=1e-4)
    std = np.sqrt(np.asarray(st.S["lidar"]) / 100)
    np.testing.assert_allclose(std, xs.std(0), rtol=1e-4)
    out = normalize({"lidar": jnp.asarray(xs), "target": jnp.asarray(ts)}, st)
    assert abs(float(out["lidar"].mean())) < 1e-3


def test_replay_ring_and_img_quantization():
    from hope_tpu.agents import push_batch, replay_create, replay_sample

    ex = {"obs/lidar": jnp.zeros(4), "obs/img": jnp.zeros((3, 8, 8)),
          "action": jnp.zeros(2), "reward": jnp.zeros(()), "done": jnp.zeros((), bool)}
    buf = replay_create(16, ex)
    img = jnp.full((4, 3, 8, 8), 100.0 / 255.0)
    batch = {"obs/lidar": jnp.ones((4, 4)), "obs/img": img,
             "action": jnp.zeros((4, 2)), "reward": jnp.ones(4),
             "done": jnp.zeros(4, bool)}
    for _ in range(6):     # 24 pushes > capacity 16: ring wraps
        buf = push_batch(buf, batch)
    assert int(buf.size) == 16
    out = replay_sample(buf, jax.random.PRNGKey(0), 8)
    np.testing.assert_allclose(np.asarray(out["obs/img"]), 100.0 / 255.0, atol=1e-6)


def test_hybrid_agent_queue_flow():
    from hope_tpu.agents import HybridState, hybrid_act, hybrid_reset_done, latch
    from hope_tpu.planning import RSPath

    B = 3
    hs = HybridState.create(B, queue_len=8)
    rs = RSPath(
        found=jnp.asarray([True, False, True]),
        lengths=jnp.tile(jnp.asarray([2.5, 0.0, 0.0, 0.0, 0.0]), (B, 1)),
        steers=jnp.zeros((B, 5)),
        L=jnp.full(B, 2.5),
    )
    hs = latch(hs, rs, step_ratio=1.25)
    assert list(np.asarray(hs.executing)) == [True, False, True]
    pa = jnp.full((B, 2), 0.7)
    a, lp, hs = hybrid_act(hs, pa, jnp.zeros(B), jnp.full(B, -1.0))
    # env 0/2 take queued straight-forward action, env 1 takes policy action
    np.testing.assert_allclose(np.asarray(a[1]), 0.7)
    np.testing.assert_allclose(np.asarray(a[0]), [0.0, 1.0])
    assert float(lp[0]) == -1.0 and float(lp[1]) == 0.0
    # 2.5 m / 1.25 = 2 chunks: queue exhausts after 2 pops
    a, lp, hs = hybrid_act(hs, pa, jnp.zeros(B), jnp.full(B, -1.0))
    assert list(np.asarray(hs.executing)) == [False, False, False]
    hs = hybrid_reset_done(hs, jnp.asarray([True, True, True]))
    assert int(hs.length.sum()) == 0


def _no_img():
    from hope_tpu.config import ObsConfig

    return ObsConfig(use_img=False)

def test_graft_encoder_into_actor_and_critic():
    """AE encoder params land in both the actor (params/embed_img/...) and the
    critic (params/net/embed_img/...) trees (reference network.py:158-162)."""
    import flax

    from hope_tpu.models.autoencoder import AEConv, graft_encoder_params

    cfg = actor_net_config()
    ae = AEConv(cfg)
    ae_params = ae.init(jax.random.PRNGKey(3), jnp.zeros((1, 3, 64, 64)))

    actor = MultiObsEmbedding(cfg)
    a_params = actor.init(jax.random.PRNGKey(4), _obs())
    critic = Critic(critic_net_config(action_input=True))
    c_params = critic.init(jax.random.PRNGKey(5), _obs(), jnp.zeros((2, 2)))

    a2 = graft_encoder_params(a_params, ae_params)
    c2 = graft_encoder_params(c_params, ae_params)

    enc = flax.traverse_util.flatten_dict(ae_params)
    enc = {k[k.index("encoder") + 1:]: v for k, v in enc.items() if "encoder" in k}
    for grafted, tree in ((a2, "actor"), (c2, "critic")):
        flat = flax.traverse_util.flatten_dict(grafted)
        hits = {k: v for k, v in flat.items() if "embed_img" in k}
        n_match = 0
        for k, v in hits.items():
            suffix = k[k.index("embed_img") + 1:]
            if suffix in enc:
                np.testing.assert_array_equal(np.asarray(v), np.asarray(enc[suffix]),
                                              err_msg=f"{tree} {k}")
                n_match += 1
        assert n_match > 0, tree


def test_sac_frozen_img_encoder_stays_fixed():
    """freeze_img_encoder: embed_img params identical after an update while
    other actor params move (reference load_img_encoder require_grad=False)."""
    import flax

    from hope_tpu.agents import SACAgent

    obs_shape = {"lidar": (120,), "target": (5,), "action_mask": (42,),
                 "img": (3, 64, 64)}
    agent = SACAgent(actor_net_config(), critic_net_config(action_input=True),
                     SACConfig(freeze_img_encoder=True), obs_shape)
    st = agent.init(jax.random.PRNGKey(0))
    B = 4
    batch = {
        "obs/lidar": jnp.ones((B, 120)), "obs/target": jnp.ones((B, 5)),
        "obs/action_mask": jnp.ones((B, 42)),
        "obs/img": jnp.full((B, 3, 64, 64), 0.5),
        "next_obs/lidar": jnp.ones((B, 120)), "next_obs/target": jnp.ones((B, 5)),
        "next_obs/action_mask": jnp.ones((B, 42)),
        "next_obs/img": jnp.full((B, 3, 64, 64), 0.5),
        "action": jnp.zeros((B, 2)), "reward": jnp.ones(B),
        "done": jnp.zeros(B, bool),
    }
    st2, _ = agent.update(st, batch, jax.random.PRNGKey(1))

    def split(tree):
        flat = flax.traverse_util.flatten_dict(tree)
        img = {k: v for k, v in flat.items() if "embed_img" in k}
        rest = {k: v for k, v in flat.items() if "embed_img" not in k}
        return img, rest

    for name, old, new in (("actor", st.actor, st2.actor),
                           ("critic1", st.critic1, st2.critic1)):
        img_old, rest_old = split(old)
        img_new, rest_new = split(new)
        for k in img_old:
            np.testing.assert_array_equal(np.asarray(img_old[k]),
                                          np.asarray(img_new[k]),
                                          err_msg=f"{name} {k} moved")
        moved = max(float(jnp.abs(rest_old[k] - rest_new[k]).max())
                    for k in rest_old)
        assert moved > 0, name
