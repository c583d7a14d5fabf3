"""Batch-dim SPMD partitioning for the fused Pallas ops.

A ``pallas_call`` lowers to an opaque custom call, and neither GSPMD nor
Shardy can partition what they cannot see: under a data-sharded batch the
partitioner REPLICATES the operands, so every device computes the FULL
global batch — an N-way compute waste on an N-chip mesh that silently
defeats data parallelism (the un-partitioned op is numerically correct,
which is why only a sharding assertion catches it).

:func:`call_batch_partitioned` wraps a fused-op implementation in
``jax.experimental.custom_partitioning`` with

* an einsum-like Shardy ``sharding_rule`` mapping the batch dim of every
  batched operand/result to one factor (every other dim gets a unique
  free factor, i.e. stays as propagated);
* GSPMD ``infer_sharding_from_operands`` / ``partition`` callbacks that
  shard batched args along whatever mesh axes the first batched operand's
  batch dim carries, replicate the rest, and lower to the SAME impl on the
  local shard — which is exactly how the kernels grid over the leading
  dim anyway;
* an optional ``reduced_out`` set: outputs that the kernel accumulates
  ACROSS the batch grid (e.g. a relative-position-bias gradient) get a
  ``lax.psum`` over the batch mesh axes in the per-shard lowering;
* a ``quantum``: the guaranteed alignment of the batch dim (e.g. ``nW``
  windows per image for window-major layouts, ``L`` bands per image for
  band-folded layouts). If the arriving sharding would split a quantum or
  divide the batch unevenly, the op falls back to a replicated lowering
  (correct, just not parallel) instead of computing garbage.

The wrapper is applied INSIDE each op's ``custom_vjp`` fwd/bwd (not
around it): ``custom_partitioning`` has no differentiation rule, and the
backward's pallas calls each need their own partitioning anyway.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax._src.interpreters.partial_eval import convert_constvars_jaxpr
from jax.experimental.custom_partitioning import custom_partitioning
from jax.extend.core import ClosedJaxpr, jaxpr_as_fun
from jax.sharding import NamedSharding, PartitionSpec


def use_spmd() -> bool:
    """Batch-partition the fused kernels under sharded inputs so data
    parallelism shards the pallas calls instead of replicating them.
    FAIRM_PALLAS_SPMD=0 disables."""
    return (os.environ.get("FAIRM_PALLAS_SPMD", "1")
            not in ("0", "false", "False"))


def spmd_call(impl, pairs, out_batch_dims=(0,), reduced_out=(),
              quantum=1):
    """``impl(*arrays)`` batch-partitioned; ``pairs`` is
    ``[(array_or_None, batch_dim_or_None), ...]`` in impl's arg order —
    None arrays are dropped and re-inserted positionally, so impl always
    sees the full arg list."""
    live = [(i, a, bd) for i, (a, bd) in enumerate(pairs) if a is not None]
    if not use_spmd():
        full = [a for a, _ in pairs]
        return impl(*full)

    def packed(*arrs):
        full = [None] * len(pairs)
        for (i, _, _), a in zip(live, arrs):
            full[i] = a
        return impl(*full)

    return call_batch_partitioned(
        packed, [a for _, a, _ in live], [bd for _, _, bd in live],
        out_batch_dims, reduced_out, quantum)


def _rule(args, batch_dims, outs, out_batch_dims, reduced_out):
    """Einsum-like Shardy rule: factor ``b`` on every batch dim, a unique
    free factor everywhere else. Reduced outputs simply don't mention
    ``b`` (a contracted factor, in einsum terms)."""
    fresh = iter(f"f{i}" for i in range(256))

    def term(ndim, bdim):
        return " ".join("b" if d == bdim else next(fresh)
                        for d in range(ndim))

    lhs = ", ".join(term(a.ndim, bd) for a, bd in zip(args, batch_dims))
    rhs = ", ".join(term(o.ndim, None if i in reduced_out else bd)
                    for i, (o, bd) in enumerate(zip(outs, out_batch_dims)))
    return f"{lhs} -> {rhs}"


def _batch_axes(arg_shapes, batch_dims):
    """Mesh axes on the first sharded batch dim (None if replicated)."""
    for s, bd in zip(arg_shapes, batch_dims):
        if bd is None:
            continue
        spec = s.sharding.spec
        if len(spec) > bd and spec[bd] is not None:
            return spec[bd]
    return None


def _axis_size(mesh, axes) -> int:
    if isinstance(axes, (tuple, list)):
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axes]


def _spec(ndim, bdim, axes):
    return PartitionSpec(*[axes if d == bdim else None
                           for d in range(ndim)])


def call_batch_partitioned(impl, args: Sequence,
                           batch_dims: Sequence[Optional[int]],
                           out_batch_dims: Sequence[Optional[int]],
                           reduced_out: Sequence[int] = (),
                           quantum: int = 1):
    """Invoke ``impl(*args)`` as a batch-partitionable op.

    Args:
      impl: function of the given arrays only (close over statics first);
        returns one array or a tuple.
      args: the actual arrays (shapes are needed to build the rule).
      batch_dims: per-arg batch-dim index, or None for replicated args.
      out_batch_dims: per-output batch-dim index (None + listing the
        output in ``reduced_out`` = batch-summed output).
      reduced_out: output indices whose per-shard values must be
        ``psum``-ed over the batch mesh axes.
      quantum: batch-dim alignment a shard boundary must not split.
    """
    args = tuple(args)
    out_batch_dims = tuple(out_batch_dims)
    reduced_out = frozenset(reduced_out)
    single_out = len(out_batch_dims) == 1

    # custom_partitioning rejects functions whose jaxpr carries constants
    # (the kernels embed trace-time numpy tables — packed biases, masks):
    # trace once and lift every const into an explicit replicated operand.
    closed = jax.make_jaxpr(impl)(*args)
    consts = tuple(jax.numpy.asarray(c) for c in closed.consts)
    lifted = ClosedJaxpr(convert_constvars_jaxpr(closed.jaxpr), ())
    flat = jaxpr_as_fun(lifted)              # (*consts, *args) -> flat outs
    outs = [v.aval for v in closed.jaxpr.outvars]
    orig_impl = impl
    # the python impl, minus the prepended const operands — used for the
    # per-shard lowering, where it re-traces at LOCAL shapes (and simply
    # rebuilds its constants; the const operands exist only so the
    # top-level registered fn is const-free, which custom_partitioning
    # requires)
    local_impl = lambda *a: orig_impl(*a[len(consts):])
    impl = ((lambda *a: flat(*a)[0]) if single_out
            else (lambda *a: tuple(flat(*a))))
    args = consts + args
    batch_dims = (None,) * len(consts) + tuple(batch_dims)

    f = custom_partitioning(impl)

    def _shardings(mesh, axes):
        ns = lambda sp: NamedSharding(mesh, sp)
        ins = tuple(ns(_spec(a.ndim, bd, axes) if axes is not None else
                       PartitionSpec())
                    for a, bd in zip(args, batch_dims))
        out = tuple(ns(_spec(o.ndim,
                             None if i in reduced_out else bd,
                             axes) if axes is not None else PartitionSpec())
                    for i, (o, bd) in enumerate(zip(outs, out_batch_dims)))
        return ins, (out[0] if single_out else out)

    def _ok(mesh, axes):
        if axes is None:
            return False
        n = _axis_size(mesh, axes)
        B = next(a.shape[bd] for a, bd in zip(args, batch_dims)
                 if bd is not None)
        return B % n == 0 and (B // n) % quantum == 0

    def partition(mesh, arg_shapes, result_shape):
        axes = _batch_axes(arg_shapes, batch_dims)
        if not _ok(mesh, axes):
            ins, out = _shardings(mesh, None)
            return mesh, local_impl, out, ins
        ins, out = _shardings(mesh, axes)
        if not reduced_out:
            return mesh, local_impl, out, ins

        def lower(*a):
            res = local_impl(*a)
            res = [res] if single_out else list(res)
            for i in reduced_out:
                res[i] = jax.lax.psum(res[i], axes)
            return res[0] if single_out else tuple(res)

        return mesh, lower, out, ins

    def infer(mesh, arg_shapes, result_shape):
        axes = _batch_axes(arg_shapes, batch_dims)
        if not _ok(mesh, axes):
            axes = None
        _, out = _shardings(mesh, axes)
        return out

    f.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule=_rule(args, batch_dims, outs, out_batch_dims,
                            reduced_out))
    return f(*args)
