"""Engine-level checkpoint / resume (capability the reference lacks;
SURVEY.md §5.4)."""

import numpy as np

from betty_tpu import Config, EngineConfig

from fixtures import make_engine


def test_checkpoint_roundtrip(tmp_path):
    engine, outer, inner = make_engine(
        Config(unroll_steps=2), EngineConfig(train_iters=6)
    )
    engine.run()
    w_trained = np.asarray(engine.states["inner"]["params"]["w"]).copy()
    engine.save_checkpoint(str(tmp_path))

    engine2, outer2, inner2 = make_engine(
        Config(unroll_steps=2), EngineConfig(train_iters=6)
    )
    engine2.load_checkpoint(str(tmp_path))
    assert engine2.global_step == 6
    assert inner2._count == 6
    w_restored = np.asarray(engine2.states["inner"]["params"]["w"])
    assert np.array_equal(w_trained, w_restored)

    # training can continue from the restored state
    engine2.train_iters = 2
    engine2.run()
    assert inner2._count == 8
