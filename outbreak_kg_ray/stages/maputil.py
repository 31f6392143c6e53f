"""map_stage — run a stage class over a Dataset with the right pool.

Default is the TASK pool with a prebuilt instance: Ray reuses warm
worker processes for tasks but starts FRESH processes for every actor
pool, and on this host a pool spawn costs ~2 s per execution — pure
overhead when the stage's one-time state is microscopic (a header
layout, a compiled pattern, a few-KB query matrix or codebook). The
instance is constructed once on the driver, cloudpickled once into
the object store with the transform, and fetched once per worker —
the same broadcast-not-reshipped property the ray.put pattern gives.

Pass ``concurrency`` to opt back into the actor pool: that is the
right shape when per-actor ``__init__`` is genuinely expensive (model
weights, GPU init, multi-MB lexicon compile) or the state must NOT
transit the driver. The headline NER/grounding stages keep their
actor pools for exactly that reason (stages/ner.py, stages/fused.py).
"""

from __future__ import annotations


def map_stage(ds, cls, *, batch_size: int, concurrency=None,
              ctor_args=(), **ctor):
    if concurrency is None:
        return ds.map_batches(
            cls(*ctor_args, **ctor),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    kwargs = {}
    if ctor_args:
        kwargs["fn_constructor_args"] = ctor_args
    if ctor:
        kwargs["fn_constructor_kwargs"] = ctor
    return ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )
