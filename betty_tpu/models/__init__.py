"""Model zoo for the example workloads.

The reference keeps models inside ``examples/`` (ResNet-32 in
``examples/learning_to_reweight/resnet.py``, Meta-Weight-Net MLP in
``examples/learning_to_reweight/main.py``, DARTS supernet in
``examples/neural_architecture_search/model_search.py``, Omniglot CNN in
``examples/implicit_maml``). Here they are first-class flax modules designed
for TPU: NCHW->NHWC layouts, bf16-friendly, BatchNorm via mutable
``batch_stats`` collections threaded through the problem state.
"""

from betty_tpu.models.mlp import MLP, MetaWeightNet
from betty_tpu.models.resnet import (
    ResNet,
    ResNet32,
    ResNet50,
    ResNetV1,
    WideResNet,
)
from betty_tpu.models.omniglot import OmniglotCNN
from betty_tpu.models.transformer import (
    TransformerClassifier,
    make_pipelined_transformer,
    roberta_large_config,
)

__all__ = [
    "MLP",
    "MetaWeightNet",
    "ResNet",
    "ResNet32",
    "ResNet50",
    "ResNetV1",
    "WideResNet",
    "OmniglotCNN",
    "TransformerClassifier",
    "make_pipelined_transformer",
    "roberta_large_config",
]
