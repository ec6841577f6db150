"""Measure the REFERENCE implementation's meta-step throughput (torch, CPU)
on the Meta-Weight-Net workload, for bench.py's ``vs_baseline``.

This script *executes* the reference library from its read-only mount (no
code is copied into betty_tpu); it builds the same bilevel program shapes as
examples/learning_to_reweight and prints steps/sec on the last line.
"""

import sys
import time

REF_ROOT, BATCH = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, REF_ROOT)
sys.path.insert(0, f"{REF_ROOT}/examples/learning_to_reweight")

import numpy as np
import torch
import torch.nn.functional as F

from betty.configs import Config, EngineConfig  # reference package
from betty.engine import Engine
from betty.problems import ImplicitProblem
from model import ResNet32  # reference example model

WARMUP, TIMED = 1, 4

rng = np.random.RandomState(0)


def loader(n, seed):
    r = np.random.RandomState(seed)
    x = torch.from_numpy(r.randn(n, BATCH, 3, 32, 32).astype(np.float32))
    y = torch.from_numpy(r.randint(0, 10, size=(n, BATCH)).astype(np.int64))
    return [(x[i], y[i]) for i in range(n)]


class MWN(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Linear(1, 100), torch.nn.ReLU(), torch.nn.Linear(100, 1)
        )

    def forward(self, x):
        return torch.sigmoid(self.net(x))


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.classifier(inputs)
        return F.cross_entropy(outputs, labels)


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.module(inputs)
        ce = F.cross_entropy(outputs, labels, reduction="none").reshape(-1, 1)
        weight = self.reweight(ce.detach())
        return torch.mean(weight * ce)


mwn = MWN()
reweight = Reweight(
    name="reweight",
    module=mwn,
    optimizer=torch.optim.Adam(mwn.parameters(), lr=1e-5),
    train_data_loader=loader(8, 1),
    config=Config(type="darts"),
)
net = ResNet32(10)
classifier = Classifier(
    name="classifier",
    module=net,
    optimizer=torch.optim.SGD(net.parameters(), lr=0.1, momentum=0.9),
    train_data_loader=loader(16, 0),
    config=Config(type="darts", unroll_steps=1),
)
engine = Engine(
    config=EngineConfig(train_iters=WARMUP + TIMED, strategy="cpu"),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)

engine.train()
for _ in range(WARMUP):
    engine.global_step += 1
    engine.train_step()
t0 = time.perf_counter()
for _ in range(TIMED):
    engine.global_step += 1
    engine.train_step()
t1 = time.perf_counter()
print(TIMED / (t1 - t0))
