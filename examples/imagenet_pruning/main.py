"""ImageNet data pruning with an EMA teacher (bilevel reweighting).

Capability port of reference ``examples/imagenet_pruning/main.py``:
meta-weight-net reweighter <- ResNet-50 student, with an EMA teacher updated
in ``param_callback`` (reference main.py:325-329) and a two-feature
meta-weight input [per-example CE loss, teacher-consistency loss]
(main.py:317-321). Gradient accumulation supported. Synthetic ImageNet-shaped
data by default; ``--data-dir`` ingests a classification npz
(``x_train/y_train/x_test/y_test``, any image size — e.g. resized ImageNet
shards) with top-1 validation accuracy. ``strategy="dp"`` reproduces the
reference README's 4-GPU layout on a mesh.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MetaWeightNet, ResNetV1
from betty_tpu.module import from_flax


def make_synthetic_imagenet(n, num_classes, size, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, size, size, 3).astype(np.float32)
    y = rng.randint(0, num_classes, size=n).astype(np.int32)
    return x, y


from betty_tpu.data import ArrayLoader


class Loader(ArrayLoader):
    def __init__(self, x, y, batch_size, seed=0, device=False):
        # device=True keeps the dataset resident in HBM: per-batch slicing
        # becomes a device gather instead of a per-step host transfer of
        # batch x H x W x 3 floats (~50 MB/step at batch 64 / 256^2 — the
        # r4 bench's 0.4%-MFU row was measuring exactly that transfer, not
        # ResNet-50 compute; see BENCH_DETAIL imagenet_pruning r5)
        super().__init__(x, y, batch_size=batch_size, seed=seed,
                         device=device)


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        if self.cfg.get("augment"):
            # held-out clean meta split: deterministic eval transform
            # (Resize+CenterCrop+Normalize, reference dataset.py:50-56)
            from betty_tpu.data import imagenet_eval_transform

            inputs = imagenet_eval_transform(
                inputs, out_size=self.cfg["crop_size"])
        logits = self.classifier(inputs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss


class Classifier(ImplicitProblem):
    """Student with EMA teacher; the teacher lives in this problem's state
    ``extra`` so it travels with checkpoints and stays on device."""

    def training_step(self, batch):
        inputs, labels = batch
        if self.cfg.get("augment"):
            # DEVICE-SIDE RandomResizedCrop+Flip+Normalize (the reference's
            # torchvision pipeline, dataset.py:35-46, run inside the jitted
            # step — betty_tpu/data/augment.py); keyed off the per-step rng
            from betty_tpu.data import imagenet_train_transform

            inputs = imagenet_train_transform(
                inputs, self.rng, out_size=self.cfg["crop_size"])
        logits = self.module(inputs)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)

        teacher_params = self.state_extra_teacher()
        teacher_logits = self.module_fn.apply(
            {"params": teacher_params,
             **{k: v for k, v in self.teacher_stats().items()}},
            inputs, train=False, mutable=(),
        )
        consistency = jnp.sum(
            (jax.nn.softmax(logits) - jax.nn.softmax(teacher_logits)) ** 2,
            axis=1,
        )
        features = jnp.stack(
            [jax.lax.stop_gradient(ce), jax.lax.stop_gradient(consistency)],
            axis=1,
        )
        weight = self.reweight(features)
        return jnp.mean(weight * ce)

    # -- EMA plumbing -----------------------------------------------------
    def state_extra_teacher(self):
        from betty_tpu.problems.problem import _TRACE_CTX

        if _TRACE_CTX is not None and self.name in _TRACE_CTX:
            return _TRACE_CTX[self.name]["extra"]["teacher_params"]
        return self.state["extra"]["teacher_params"]

    def teacher_stats(self):
        from betty_tpu.problems.problem import _TRACE_CTX

        if _TRACE_CTX is not None and self.name in _TRACE_CTX:
            extra = _TRACE_CTX[self.name]["extra"]
        else:
            extra = self.state["extra"]
        return {k: v for k, v in extra.items()
                if k not in ("teacher_params",)}

    def init_state(self, rng=None):
        state = super().init_state(rng)
        # EMA teacher starts as a *copy* of the student (distinct buffers:
        # aliasing would break state donation)
        state["extra"] = {
            **state["extra"],
            "teacher_params": jax.tree_util.tree_map(
                jnp.copy, state["params"]
            ),
        }
        return state

    def param_callback(self):
        # EMA update (reference main.py:325-329), traced inside the jitted
        # optimizer step via the context binding
        from betty_tpu.problems.problem import _TRACE_CTX

        decay = self.cfg["ema_decay"]
        extra = _TRACE_CTX[self.name]["extra"]
        new_teacher = jax.tree_util.tree_map(
            lambda t, s: decay * t + (1 - decay) * s,
            extra["teacher_params"], self.params,
        )
        self.set_extra({**extra, "teacher_params": new_teacher})

    def set_extra(self, new_extra):
        import betty_tpu.problems.problem as pm

        ctx = dict(pm._TRACE_CTX)
        entry = dict(ctx[self.name])
        entry["extra"] = new_extra
        ctx[self.name] = entry
        pm._TRACE_CTX = ctx


class PruneEngine(Engine):
    test_data = None
    eval_crop = None  # set when --augment device (images arrive uncropped)

    def validation(self):
        if self.test_data is None:
            return {}
        from vision_data import problem_accuracy

        x, y = self.test_data
        fwd = self.classifier
        if self.eval_crop is not None:
            from betty_tpu.data import imagenet_eval_transform

            crop = self.eval_crop

            def fwd(xb):  # noqa: F811 — eval transform on device, per batch
                return self.classifier(
                    imagenet_eval_transform(xb, out_size=crop))
        return {"top1": problem_accuracy(fwd, x, y)}


def build_engine(args):
    test_data = None
    if getattr(args, "data_dir", None):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from vision_data import load_classification

        x_train, y_train, x_test, y_test = load_classification(args.data_dir)
        # balanced meta split out of the train set (reference uses a held-out
        # clean subset to drive the pruning scores)
        rng = np.random.RandomState(0)
        meta_idx = rng.permutation(len(y_train))[: args.meta_size]
        mask = np.ones(len(y_train), bool)
        mask[meta_idx] = False
        x_meta, y_meta = x_train[meta_idx], y_train[meta_idx]
        x_train, y_train = x_train[mask], y_train[mask]
        args.image_size = x_train.shape[1]
        args.num_classes = int(y_train.max()) + 1
        test_data = (x_test, y_test)
    else:
        if getattr(args, "device_data", False):
            # generate the synthetic set directly on device: zero host
            # transfer (the tunneled runtime moves bulk data at ~1 MB/s;
            # even the one-time upfront device_put would dominate)
            def dev_synth(n, seed):
                kx, ky = jax.random.split(jax.random.PRNGKey(seed))
                x = jax.random.normal(
                    kx, (n, args.image_size, args.image_size, 3),
                    jnp.float32)
                y = jax.random.randint(ky, (n,), 0, args.num_classes,
                                       jnp.int32)
                return x, y

            x_train, y_train = dev_synth(args.train_size, 0)
            x_meta, y_meta = dev_synth(args.meta_size, 1)
        else:
            x_train, y_train = make_synthetic_imagenet(
                args.train_size, args.num_classes, args.image_size, seed=0)
            x_meta, y_meta = make_synthetic_imagenet(
                args.meta_size, args.num_classes, args.image_size, seed=1)

    augment = getattr(args, "augment", "none") == "device"
    model_size = args.crop_size if augment else args.image_size
    sample = jnp.zeros(
        (args.batch_size, model_size, model_size, 3), jnp.float32)
    student = from_flax(
        ResNetV1(stage_sizes=tuple(args.stages), num_classes=args.num_classes,
                 width=args.width),
        sample, rng=jax.random.PRNGKey(0), train_kwarg="train",
    )
    mwn = from_flax(MetaWeightNet(in_features=2),
                    jnp.zeros((args.batch_size, 2)),
                    rng=jax.random.PRNGKey(1), train_kwarg="train")

    aug_cfg = (
        {"augment": True, "crop_size": args.crop_size} if augment else {}
    )
    precision = getattr(args, "precision", "fp32")
    reweight = Reweight(
        name="reweight", module=mwn, optimizer=optim.adam(lr=1e-4),
        train_data_loader=Loader(x_meta, y_meta, args.batch_size, seed=1,
                                 device=getattr(args, "device_data", False)),
        config=Config(type="darts", log_step=args.log_step,
                      precision=precision),
        extra_config=aug_cfg,
    )
    classifier = Classifier(
        name="classifier", module=student,
        optimizer=optim.sgd(lr=args.lr, momentum=0.9, weight_decay=1e-4),
        train_data_loader=Loader(x_train, y_train, args.batch_size, seed=0,
                                 device=getattr(args, "device_data", False)),
        config=Config(type="darts", unroll_steps=1,
                      gradient_accumulation=args.gas,
                      log_step=args.log_step, precision=precision),
        extra_config={"ema_decay": args.ema_decay, **aug_cfg},
    )
    engine = PruneEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=getattr(args, "valid_step", 1000),
                            strategy=args.strategy),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )
    engine.test_data = test_data
    if augment:
        engine.eval_crop = args.crop_size
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--stages", type=int, nargs="+", default=[3, 4, 6, 3])
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--gas", type=int, default=1)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--train_size", type=int, default=256)
    p.add_argument("--meta_size", type=int, default=128)
    p.add_argument("--train_iters", type=int, default=10)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--strategy", default="default")
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="classification npz (x_train/y_train/x_test/y_test)")
    p.add_argument("--augment", choices=["none", "device"], default="none",
                   help="'device': the reference's torchvision train/eval "
                        "pipelines (RandomResizedCrop+Flip+Normalize / "
                        "Resize+CenterCrop+Normalize, dataset.py:35-56) as "
                        "batched jax ops INSIDE the jitted step "
                        "(betty_tpu/data/augment.py)")
    p.add_argument("--crop_size", type=int, default=224,
                   help="model input size under --augment device")
    p.add_argument("--device_data", action="store_true",
                   help="keep the dataset resident in HBM (batches become "
                        "device gathers; synthetic data is generated "
                        "on-device)")
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
