"""Functional module abstraction.

The reference attaches a live ``torch.nn.Module`` to each problem
(``betty/problems/problem.py:29-318``). On TPU, parameters must be explicit
pytree state so the whole multilevel program can be traced into one XLA
program. ``FunctionalModule`` is that boundary: a pair of pure functions

    init(rng)                      -> variables  (dict of collections)
    apply(variables, *args, ...)   -> outputs (and possibly mutated collections)

with the trainable collection under ``variables["params"]`` and any mutable
non-trainable collections (e.g. flax ``batch_stats``) alongside it.

Adapters are provided for flax linen modules, plain (init, apply) pairs and
raw parameter pytrees with an apply function.
"""

from typing import Any, Callable, Dict, Optional, Sequence

import jax


class FunctionalModule:
    """A pure-function module: explicit parameters + apply function.

    ``apply_fn`` signature::

        apply_fn(variables: dict, *args, train: bool, rngs: dict | None,
                 mutable: Sequence[str]) -> out | (out, mutated_collections)

    When ``mutable`` is empty the bare output is returned.
    """

    def __init__(
        self,
        apply_fn: Callable,
        init_fn: Optional[Callable] = None,
        variables: Optional[Dict[str, Any]] = None,
        mutable_collections: Sequence[str] = (),
        rng_names: Sequence[str] = ("dropout",),
    ):
        self.apply_fn = apply_fn
        self.init_fn = init_fn
        self.variables = variables
        self.mutable_collections = tuple(mutable_collections)
        # rng collections the apply function consumes; Problem.forward feeds
        # one per-step key per name (first name gets the step key itself,
        # later names get stable folds of it)
        self.rng_names = tuple(rng_names)

    def init(self, rng) -> Dict[str, Any]:
        if self.variables is not None:
            return self.variables
        if self.init_fn is None:
            raise ValueError("FunctionalModule has neither variables nor init_fn")
        return self.init_fn(rng)

    def apply(self, variables, *args, train: bool = True, rngs=None, mutable=(), **kwargs):
        return self.apply_fn(
            variables, *args, train=train, rngs=rngs, mutable=mutable, **kwargs
        )


def from_fn(apply_fn: Callable, params) -> FunctionalModule:
    """Wrap a plain ``apply_fn(params, *args) -> out`` and a params pytree.

    The simplest module form — e.g. the reference regression-test ``ChildNet``
    (a bare weight vector, ``test/test_regression.py:13-21``) becomes
    ``from_fn(lambda p, x: x @ p["w"], {"w": jnp.zeros(20)})``.
    """

    def wrapped(variables, *args, train=True, rngs=None, mutable=(), **kwargs):
        out = apply_fn(variables["params"], *args, **kwargs)
        if mutable:
            return out, {}
        return out

    return FunctionalModule(wrapped, variables={"params": params})


def from_flax(module, *sample_args, rng=None, variables=None, apply_kwargs=None,
              train_kwarg: Optional[str] = None, rng_names: Sequence[str] = ("dropout",),
              init_train: bool = False, **sample_kwargs) -> FunctionalModule:
    """Adapt a ``flax.linen.Module``.

    ``train_kwarg`` names the module's training-mode kwarg (e.g. ``"train"``
    or ``"deterministic"``-negated modules should pass a lambda via
    ``apply_kwargs`` instead). Mutable collections (``batch_stats`` etc.) are
    discovered from the initialized variables.
    """
    import flax.linen as nn  # local import: flax optional at module scope

    del nn
    apply_kwargs = dict(apply_kwargs or {})

    if variables is None:
        from betty_tpu.utils import fold_rng_name

        if rng is None:
            rng = jax.random.PRNGKey(0)
        init_rngs = {"params": rng}
        for name in rng_names:
            # stable fold (hash() is salted per interpreter, which would make
            # initialization diverge across processes/hosts)
            init_rngs[name] = fold_rng_name(rng, name)
        # factory defaults first, explicit sample_kwargs win; the
        # framework-controlled train flag is set last
        kw = {**apply_kwargs, **sample_kwargs}
        if train_kwarg is not None:
            # init_train=True for modules whose parameter set only
            # materializes in training mode (e.g. an auxiliary head)
            kw[train_kwarg] = init_train
        variables = module.init(init_rngs, *sample_args, **kw)
    variables = dict(variables)
    mutable_collections = tuple(k for k in variables.keys() if k != "params")

    def apply_fn(vs, *args, train=True, rngs=None, mutable=(), **kwargs):
        # per-call kwargs override the factory-time apply_kwargs defaults
        kw = {**apply_kwargs, **kwargs}
        if train_kwarg is not None:
            kw[train_kwarg] = train
        if mutable:  # flax returns (out, mutated) iff mutable is passed
            return module.apply(vs, *args, rngs=rngs, mutable=list(mutable), **kw)
        return module.apply(vs, *args, rngs=rngs, **kw)

    return FunctionalModule(apply_fn, variables=variables,
                            mutable_collections=mutable_collections,
                            rng_names=rng_names)


def from_hf_flax(hf_model, pad_token_id: Optional[int] = None) -> FunctionalModule:
    """Adapt a HuggingFace ``transformers`` Flax model (e.g.
    ``FlaxRobertaForSequenceClassification`` — the reference trains HF
    roberta-large, ``examples/bert_data_reweighting/model.py``).

    ``apply(variables, input_ids)`` returns classification logits; an
    attention mask is derived from the config's pad token unless passed
    explicitly. Dropout consumes the per-step ``"dropout"`` rng that
    ``Problem.forward`` threads through.
    """
    import jax.numpy as jnp

    pad = pad_token_id
    if pad is None:
        pad = getattr(hf_model.config, "pad_token_id", None)

    def apply_fn(vs, input_ids, *args, train=True, rngs=None, mutable=(), **kwargs):
        mask = kwargs.pop("attention_mask", None)
        if mask is None:
            if pad is not None:
                mask = (input_ids != pad).astype(jnp.int32)
            else:
                mask = jnp.ones_like(input_ids)
        # the FlaxPreTrainedModel __call__ supplies position/token-type
        # defaults per model family and routes params/dropout_rng explicitly
        out = hf_model(
            input_ids, attention_mask=mask, params=vs["params"],
            dropout_rng=(rngs or {}).get("dropout"), train=train, **kwargs
        )
        logits = out.logits if hasattr(out, "logits") else out[0]
        if mutable:
            return logits, {}
        return logits

    return FunctionalModule(apply_fn, variables={"params": hf_model.params})


def ensure_module(obj) -> FunctionalModule:
    """Coerce user input into a FunctionalModule.

    Accepts: FunctionalModule | ``(apply_fn, params)`` tuple. Wrap flax
    modules with :func:`from_flax` (an init'd variables dict is required,
    so a bare flax module object is not accepted here).
    """
    if isinstance(obj, FunctionalModule):
        return obj
    if isinstance(obj, tuple) and len(obj) == 2 and callable(obj[0]):
        return from_fn(obj[0], obj[1])
    raise TypeError(
        f"Cannot interpret {type(obj)} as a module; pass a FunctionalModule, "
        "(apply_fn, params), or use betty_tpu.module.from_flax()."
    )
