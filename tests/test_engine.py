"""Graph-mechanics unit tests — mirrors reference ``test/test_engine.py``:
find_paths orientation, leaf detection, name-attribute injection,
parent/child wiring, and the unroll counter contract."""

from betty_tpu import Config, EngineConfig

from fixtures import make_engine


def build(unroll=10, iters=10):
    return make_engine(
        Config(unroll_steps=unroll),
        EngineConfig(train_iters=iters),
    )


def test_find_paths():
    engine, outer, inner = build()
    assert [[p.name for p in path] for path in outer.paths] == [
        ["outer", "inner", "outer"]
    ]
    assert inner.paths == []


def test_leaves():
    engine, outer, inner = build()
    assert engine.leaves == [inner]
    assert inner.leaf and not outer.leaf


def test_name_attr_injection():
    engine, outer, inner = build()
    assert engine.outer is outer and engine.inner is inner
    assert inner.outer is outer and outer.inner is inner


def test_parent_child_wiring():
    engine, outer, inner = build()
    assert inner.parents == [outer]
    assert outer.children == [inner]
    assert inner.children == [] and outer.parents == []


def test_unroll_counter_contract():
    # 10 engine steps with unroll_steps=10 -> inner.count==10, outer.count==1
    # (reference test_engine.py:146-152)
    engine, outer, inner = build(unroll=10, iters=10)
    engine.run()
    assert inner.count == 10
    assert outer.count == 1


def test_trilevel_counts():
    """u2l chain a<-b<-c with unrolls 2 (b) and 3 (c): after 12 engine steps
    c stepped 12x, b 4x, a 2x."""
    import jax.numpy as jnp

    from betty_tpu import Engine, ImplicitProblem, optim
    from betty_tpu.module import from_fn
    from fixtures import bce, make_data

    train, valid = make_data()

    class A(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            return bce(self.c(i)[0], t)

    class B(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            w = self.module()
            return bce(self.c(i)[0], t) + 0.01 * jnp.sum(self.a() * w * w)

    class C(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            o, p = self.module(i)
            return bce(o, t) + 0.01 * jnp.sum(self.b() * p * p)

    vec = from_fn(lambda p: p["w"], {"w": jnp.ones(20)})
    mat = from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.zeros(20)})
    a = A("a", module=vec, optimizer=optim.sgd(lr=0.1),
          train_data_loader=[valid], config=Config())
    b = B("b", module=from_fn(lambda p: p["w"], {"w": jnp.ones(20)}),
          optimizer=optim.sgd(lr=0.1), train_data_loader=[valid],
          config=Config(unroll_steps=2))
    c = C("c", module=mat, optimizer=optim.sgd(lr=0.1),
          train_data_loader=[train], config=Config(unroll_steps=3))
    engine = Engine(
        config=EngineConfig(train_iters=12),
        problems=[a, b, c],
        dependencies={"u2l": {a: [b], b: [c]}, "l2u": {c: [b], b: [a]}},
    )
    engine.run()
    assert (c.count, b.count, a.count) == (12, 4, 2)
    assert [[q.name for q in p] for p in a.paths] == [["a", "b", "a"]]
    assert [[q.name for q in p] for p in b.paths] == [["b", "c", "b"]]


def test_multi_path_graph():
    """Learning-by-ignoring-shaped graph: two paths into the top problem
    (reference examples/learning_by_ignoring, SURVEY.md §2.4)."""
    import jax.numpy as jnp

    from betty_tpu import Engine, ImplicitProblem, optim
    from betty_tpu.module import from_fn
    from fixtures import bce, make_data

    train, valid = make_data()

    class Reweight(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            return bce(self.finetune(i)[0], t)

    class Finetune(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            o, p = self.module(i)
            return bce(o, t) + 0.01 * jnp.sum(
                (p - self.pretrain.params["w"]) ** 2
            )

    class Pretrain(ImplicitProblem):
        def training_step(self, batch):
            i, t = batch
            o, p = self.module(i)
            w = self.reweight()
            return bce(o, t) + 0.01 * jnp.sum(w * p * p)

    mat = lambda: from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.zeros(20)})
    rw = Reweight("reweight", module=from_fn(lambda p: p["w"], {"w": jnp.ones(20)}),
                  optimizer=optim.sgd(lr=0.1), train_data_loader=[valid],
                  config=Config())
    ft = Finetune("finetune", module=mat(), optimizer=optim.sgd(lr=0.1),
                  train_data_loader=[train], config=Config())
    pt = Pretrain("pretrain", module=mat(), optimizer=optim.sgd(lr=0.1),
                  train_data_loader=[train], config=Config())
    engine = Engine(
        config=EngineConfig(train_iters=4),
        problems=[rw, ft, pt],
        dependencies={
            "u2l": {rw: [pt]},
            "l2u": {pt: [ft, rw], ft: [rw]},
        },
    )
    # two paths: reweight<-finetune<-pretrain and reweight<-pretrain
    path_names = sorted(
        [[q.name for q in p] for p in rw.paths], key=len
    )
    assert path_names == [
        ["reweight", "pretrain", "reweight"],
        ["reweight", "finetune", "pretrain", "reweight"],
    ]
    engine.run()
    assert rw.count == 4  # pretrain is the only leaf; unrolls of 1 everywhere
