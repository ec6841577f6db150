"""Distributed strategies on an 8-device CPU mesh: DP must be numerically
identical to single-device (mean loss over a sharded batch); ZeRO and FSDP
must run and converge. This is coverage the reference does not have at all
(SURVEY.md §4: 'Distributed testing: none')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betty_tpu import Config, Engine, EngineConfig, optim
from betty_tpu.parallel import fsdp_shardings, make_mesh

from fixtures import Inner, Outer, child_module, final_outer_loss, make_data, parent_module


def build_engine(strategy, train, valid, iters=20):
    outer = Outer("outer", module=parent_module(),
                  optimizer=optim.sgd(lr=1.0, momentum=0.9),
                  train_data_loader=[valid], config=Config())
    inner = Inner("inner", module=child_module(),
                  optimizer=optim.sgd(lr=0.1), train_data_loader=[train],
                  config=Config(unroll_steps=5))
    return Engine(
        config=EngineConfig(train_iters=iters, strategy=strategy),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    ), outer, inner


@pytest.fixture(scope="module")
def data():
    # batch size divisible by 8 for even sharding
    return make_data(seed=0, n=1024)


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_dp_matches_single_device(data):
    train, valid = data
    e1, o1, _ = build_engine("default", train, valid)
    e1.run()
    loss_single = final_outer_loss(e1, o1)

    e8, o8, _ = build_engine("dp", train, valid)
    e8.run()
    loss_dp = final_outer_loss(e8, o8)

    assert abs(loss_single - loss_dp) < 1e-5
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w8 = np.asarray(e8.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w8)) < 1e-5


def test_batch_actually_sharded(data):
    train, valid = data
    engine, outer, inner = build_engine("dp", train, valid, iters=1)
    engine.run()
    sharding = inner.cur_batch[0].sharding
    assert len(sharding.device_set) == 8


def test_zero_runs(data):
    train, valid = data
    engine, outer, _ = build_engine("zero", train, valid)
    engine.run()
    assert final_outer_loss(engine, outer) < 1.0


def test_fsdp_runs(data):
    train, valid = data
    engine, outer, _ = build_engine("fsdp", train, valid)
    engine.run()
    assert final_outer_loss(engine, outer) < 1.0


def test_fsdp_sharding_rule():
    mesh = make_mesh()
    tree = {
        "big": jnp.zeros((1024, 64)),   # sharded (first dim divisible by 8)
        "small": jnp.zeros((4,)),        # replicated (below min_size)
    }
    sh = fsdp_shardings(tree, mesh, min_size=1024)
    assert sh["big"].spec == jax.sharding.PartitionSpec("dp", None)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
