"""Schema-stable shuffle shims for Ray Data 2.49.

Ray's sort-based shuffle loses the block schema on empty range
partitions: ``merge_sorted_blocks`` drops every 0-row mapper slice and
falls back to a column-less empty table
(ray/data/_internal/arrow_block.py ``merge_sorted_blocks``), and
``GroupedData.map_groups`` yields nothing for such partitions so the
map task emits a schema-less empty block too
(ray/data/grouped_data.py ``_apply_udf_to_groups``).  Every downstream
operator then logs::

    WARNING streaming_executor_state.py -- Operator produced a RefBundle
    with a different schema ... new schema: PandasBlockSchema(names=[])

This module installs five narrow, behavior-preserving patches at
package-import time (driver side; they propagate to workers because the
replacement functions live in this importable module, so cloudpickle
serializes them by reference):

1. ``SortTaskSpec.reduce`` — when ALL mapper outputs for a partition are
   empty, return a 0-row block carrying the schema of any typed mapper
   slice instead of a column-less one.  Row content is untouched.

2. ``ray.data.grouped_data._apply_udf_to_groups`` — for a 0-row (but
   typed, thanks to patch 1) input partition, run the group UDF once on
   the typed empty batch and emit its result IF it is also 0-row, so the
   task's output block carries the UDF's OUTPUT schema.  If the UDF
   raises on empty input, or fabricates rows from an empty group (e.g. a
   summary row), fall back to Ray's original no-output behavior —
   results can never change, only the schema of empty blocks.

3. ``BlocksToBatchesMapTransformFn.__call__`` — the all-empty-input
   fallback batch keeps the first input block's schema (Ray builds a
   fresh column-less block) and honors the declared batch format.

4. ``plan_udf_map_op._generate_transform_fn_for_map_batches`` — Ray
   passes empty batches through map_batches WITHOUT calling the UDF, so
   empty blocks keep their INPUT schema and diverge from the stage's
   output schema.  The patched transform first offers the typed empty
   batch to the UDF and uses its output when it is also empty.

5. ``streaming_executor_state.dedupe_schemas_with_validation`` — a
   schema-less 0-row bundle carries no schema information; keep the
   operator's established schema instead of warning about it.

All patches are inert for non-empty data: they delegate to the original
Ray code paths unchanged.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator, List, Optional

from ray.data._internal.execution.operators import map_transformer as _mt
from ray.data._internal.planner.exchange.interfaces import ExchangeTaskSpec
from ray.data._internal.planner.exchange.sort_task_spec import SortTaskSpec
from ray.data._internal.table_block import TableBlockAccessor
from ray.data.block import Block, BlockAccessor, BlockExecStats, DataBatch

import ray.data.grouped_data as _grouped_data

# Originals captured exactly once per process (idempotent across
# re-imports / repeated install() calls).
_ORIG_SORT_REDUCE = None
_ORIG_APPLY_UDF = None
_ORIG_B2B_CALL = None
_ORIG_GEN_MAP_BATCHES = None
_ORIG_DEDUPE_SCHEMAS = None
_ORIG_PLAN_PROJECT = None


def _num_rows(block: Block) -> int:
    return BlockAccessor.for_block(block).num_rows()


def _typed_empty_from(
    blocks: List[Block], batch_format: str
) -> Optional[Block]:
    """A 0-row slice of the first schema-bearing block, normalized to the
    exchange's target block type; None when every block is schema-less."""
    target = ExchangeTaskSpec._derive_target_block_type(batch_format)
    for b in blocks:
        acc = BlockAccessor.for_block(b)
        try:
            if not acc.column_names():
                continue
            sliced = acc.slice(0, 0, copy=True)
            if not _batch_is_type_stable(sliced):
                continue
            return TableBlockAccessor.normalize_block_types([sliced], target)[0]
        except Exception:
            continue
    return None


def _schema_stable_sort_reduce(
    sort_key,
    batch_format: str,
    *mapper_outputs: List[Block],
    partial_reduce: bool = False,
):
    """SortTaskSpec.reduce that keeps the schema on all-empty partitions."""
    if mapper_outputs and all(_num_rows(b) == 0 for b in mapper_outputs):
        typed = _typed_empty_from(list(mapper_outputs), batch_format)
        if typed is not None:
            from ray.data.block import BlockMetadataWithSchema

            stats = BlockExecStats.builder()
            return typed, BlockMetadataWithSchema.from_block(
                typed, stats=stats.build()
            )
    return _ORIG_SORT_REDUCE(
        sort_key, batch_format, *mapper_outputs, partial_reduce=partial_reduce
    )


def _batch_num_rows(batch: DataBatch) -> Optional[int]:
    """Row count of a UDF output batch in any supported format."""
    try:
        n = getattr(batch, "num_rows", None)
        if n is not None:
            return int(n)
        shape = getattr(batch, "shape", None)
        if shape is not None:
            return int(shape[0])
        if isinstance(batch, dict):
            for v in batch.values():
                return int(len(v))
            return 0
    except Exception:
        pass
    return None


def _batch_is_type_stable(batch: DataBatch) -> bool:
    """False when a 0-row batch has lost column types (pyarrow ``null``
    columns, e.g. ``pa.Table.from_pandas`` on an empty object-dtype
    frame) — emitting it would establish a wrong operator schema."""
    try:
        import pyarrow as pa

        if isinstance(batch, pa.Table):
            return all(not pa.types.is_null(t) for t in batch.schema.types)
    except Exception:
        return False
    return True


def _schema_stable_apply_udf_to_groups(
    udf,
    block: Block,
    keys: List[str],
    batch_format: Optional[str],
    *args: Any,
    **kwargs: Any,
) -> Iterator[DataBatch]:
    """ray.data.grouped_data._apply_udf_to_groups with typed empty output."""
    accessor = BlockAccessor.for_block(block)
    if accessor.num_rows() == 0:
        try:
            if not accessor.column_names():
                return  # schema-less empty block: nothing to preserve
            out = udf(accessor.to_batch_format(batch_format), *args, **kwargs)
        except Exception:
            return  # UDF assumes non-empty groups: keep Ray's no-output path
        if _batch_num_rows(out) == 0 and _batch_is_type_stable(out):
            yield out
        return
    boundaries = accessor._get_group_boundaries_sorted(keys)
    for start, end in zip(boundaries[:-1], boundaries[1:]):
        group = accessor.slice(start, end, copy=False)
        yield udf(
            BlockAccessor.for_block(group).to_batch_format(batch_format),
            *args,
            **kwargs,
        )


def _schema_stable_blocks_to_batches(self, blocks, _ctx):
    """BlocksToBatchesMapTransformFn.__call__ whose all-empty-input
    fallback batch keeps the schema of the first input block (Ray builds
    a fresh column-less block there) and is converted to the declared
    batch format like every non-empty batch would be."""
    block_iter = iter(blocks)
    first = next(block_iter, None)
    if first is None:
        return []
    blocks = itertools.chain([first], block_iter)
    empty_block = BlockAccessor.for_block(first).slice(0, 0, copy=True)
    first = None  # don't pin the first block in memory

    formatted_batch_iter = _mt.batch_blocks(
        blocks=blocks,
        stats=None,
        batch_size=self._batch_size,
        batch_format=self._batch_format,
        ensure_copy=self._ensure_copy,
    )
    head = next(formatted_batch_iter, None)
    if head is None:
        try:
            return [
                BlockAccessor.for_block(empty_block).to_batch_format(
                    self._batch_format
                )
            ]
        except Exception:
            return [empty_block]
    return itertools.chain([head], formatted_batch_iter)


def _batch_has_columns(batch: Any) -> bool:
    try:
        acc = BlockAccessor.for_block(batch)
        return bool(acc.column_names())
    except Exception:
        return False


def _schema_stable_map_batches_transform(fn):
    """plan_udf_map_op._generate_transform_fn_for_map_batches whose
    empty-batch path first offers the (typed) empty batch to the UDF so
    the output block carries the UDF's OUTPUT schema.  Ray instead
    passes empty batches through without calling the UDF (workaround
    for all-to-all ops emitting schema-less empties — which patches 1-3
    fix), leaving input-schema empty blocks in the output stream and
    triggering executor schema-divergence warnings.  Falls back to
    Ray's passthrough whenever the UDF raises on empty input or emits
    rows from it, so results can never change."""
    import collections.abc
    from types import GeneratorType

    from ray.data._internal.planner import plan_udf_map_op as _pm

    if _pm._is_async_udf(fn):
        return _ORIG_GEN_MAP_BATCHES(fn)

    def transform_fn(batches, _ctx):
        for batch in batches:
            is_empty = (
                not isinstance(batch, collections.abc.Mapping)
                and BlockAccessor.for_block(batch).num_rows() == 0
            )
            if is_empty:
                # Offer the typed empty batch to the UDF so the output
                # carries the stage's OUTPUT schema.  If the UDF can't
                # handle empties (raises) or fabricates rows, drop the
                # batch: the task then emits a schema-less empty block
                # which patch 5 renders inert.  (Ray passes the batch
                # through unchanged, leaving an INPUT-schema empty in
                # the output stream — a guaranteed schema divergence.)
                out = None
                if _batch_has_columns(batch):
                    try:
                        res = fn(batch)
                        if isinstance(res, GeneratorType):
                            res = list(res)
                        else:
                            res = [res]
                        if res and all(
                            _batch_num_rows(b) == 0
                            and _batch_is_type_stable(b)
                            for b in res
                        ):
                            for b in res:
                                _pm._validate_batch_output(b)
                            out = res
                    except Exception:
                        out = None
                if out is not None:
                    yield from out
                continue
            try:
                res = fn(batch)
                if not isinstance(res, GeneratorType):
                    res = [res]
            except ValueError as e:
                read_only_msgs = [
                    "assignment destination is read-only",
                    "buffer source array is read-only",
                ]
                err_msg = str(e)
                if any(msg in err_msg for msg in read_only_msgs):
                    raise ValueError(
                        f"Batch mapper function {fn.__name__} tried to mutate a "
                        "zero-copy read-only batch. To be able to mutate the "
                        "batch, pass zero_copy_batch=False to map_batches(); "
                        "this will create a writable copy of the batch before "
                        "giving it to fn. To elide this copy, modify your mapper "
                        "function so it doesn't try to mutate its input."
                    ) from e
                else:
                    raise e from None
            else:
                for out_batch in res:
                    _pm._validate_batch_output(out_batch)
                    yield out_batch

    return transform_fn


def _schema_stable_dedupe_schemas(
    old_schema,
    bundle,
    warn: bool = True,
    enforce_schemas: bool = False,
):
    """streaming_executor_state.dedupe_schemas_with_validation that treats
    a schema-less 0-row bundle as carrying no schema information: keep the
    operator's established schema and don't warn.  A 0-row block has no
    values whose schema could diverge; warning on it is noise by
    construction (patches 1-4 remove most producers of such blocks, this
    covers UDFs that raise on empty groups, where no output schema can be
    known)."""
    from ray.data.block import _is_empty_schema

    if (
        not _is_empty_schema(old_schema)
        and _is_empty_schema(bundle.schema)
        and bundle.num_rows() == 0
    ):
        from ray.data._internal.execution.interfaces import RefBundle

        return (
            RefBundle(
                bundle.blocks,
                schema=old_schema,
                owns_blocks=bundle.owns_blocks,
                output_split_idx=bundle.output_split_idx,
                _cached_object_meta=bundle._cached_object_meta,
                _cached_preferred_locations=bundle._cached_preferred_locations,
            ),
            False,
        )
    return _ORIG_DEDUPE_SCHEMAS(
        old_schema, bundle, warn=warn, enforce_schemas=enforce_schemas
    )


def _project_block(block: Block, columns, columns_rename, exprs) -> Block:
    """The three projection steps of Ray's plan_project_op.fn."""
    from ray.data._expression_evaluator import eval_expr

    if exprs:
        acc = BlockAccessor.for_block(block)
        new_columns = {n: block[n] for n in acc.column_names()}
        for name, expr in exprs.items():
            new_columns[name] = eval_expr(expr, block)
        block = BlockAccessor.batch_to_block(new_columns)
    if columns:
        block = BlockAccessor.for_block(block).select(columns)
    if columns_rename:
        block = block.rename_columns(
            [columns_rename.get(col, col) for col in block.schema.names]
        )
    return block


def _schema_stable_plan_project_op(op, physical_children, data_context):
    """plan_udf_map_op.plan_project_op whose fn also projects 0-row
    TYPED blocks (Ray short-circuits every empty block, leaving
    input-schema empties in the output stream).  Schema-less or
    projection-hostile empties fall back to Ray's passthrough."""
    from ray.data._internal.compute import get_compute
    from ray.data._internal.planner import plan_udf_map_op as _pm

    assert len(physical_children) == 1
    input_physical_dag = physical_children[0]
    columns = op.cols
    columns_rename = op.cols_rename
    exprs = op.exprs

    def fn(block: Block) -> Block:
        try:
            if not BlockAccessor.for_block(block).num_rows():
                if not _batch_has_columns(block):
                    return block
                try:
                    out = _project_block(block, columns, columns_rename, exprs)
                except Exception:
                    return block
                return out if _batch_is_type_stable(out) else block
            return _project_block(block, columns, columns_rename, exprs)
        except Exception as e:
            _pm._try_wrap_udf_exception(e, block)

    transform_fn = _pm._generate_transform_fn_for_map_block(fn)
    map_transformer = _pm._create_map_transformer_for_block_based_map_op(
        transform_fn,
    )
    return _pm.MapOperator.create(
        map_transformer,
        input_physical_dag,
        data_context,
        name=op.name,
        compute_strategy=get_compute(op._compute),
        ray_remote_args=op._ray_remote_args,
        ray_remote_args_fn=op._ray_remote_args_fn,
    )


def install() -> None:
    """Install both shims (idempotent; call at package import)."""
    global _ORIG_SORT_REDUCE, _ORIG_APPLY_UDF, _ORIG_B2B_CALL
    global _ORIG_DEDUPE_SCHEMAS
    import ray.data._internal.execution.streaming_executor_state as _ses

    if _ORIG_DEDUPE_SCHEMAS is None:
        _ORIG_DEDUPE_SCHEMAS = _ses.dedupe_schemas_with_validation
        _ses.dedupe_schemas_with_validation = _schema_stable_dedupe_schemas
    global _ORIG_PLAN_PROJECT
    if _ORIG_PLAN_PROJECT is None:
        from ray.data._internal.logical.operators.map_operator import Project
        from ray.data._internal.planner.planner import Planner

        _ORIG_PLAN_PROJECT = Planner._DEFAULT_PLAN_FNS.get(Project)
        if _ORIG_PLAN_PROJECT is not None:
            Planner._DEFAULT_PLAN_FNS[Project] = _schema_stable_plan_project_op
    global _ORIG_GEN_MAP_BATCHES
    from ray.data._internal.planner import plan_udf_map_op as _pm

    if _ORIG_GEN_MAP_BATCHES is None:
        _ORIG_GEN_MAP_BATCHES = _pm._generate_transform_fn_for_map_batches
        _pm._generate_transform_fn_for_map_batches = (
            _schema_stable_map_batches_transform
        )
    if _ORIG_SORT_REDUCE is None:
        _ORIG_SORT_REDUCE = SortTaskSpec.__dict__["reduce"].__func__
        SortTaskSpec.reduce = staticmethod(_schema_stable_sort_reduce)
    if _ORIG_APPLY_UDF is None:
        _ORIG_APPLY_UDF = _grouped_data._apply_udf_to_groups
        _grouped_data._apply_udf_to_groups = _schema_stable_apply_udf_to_groups
    if _ORIG_B2B_CALL is None:
        _ORIG_B2B_CALL = _mt.BlocksToBatchesMapTransformFn.__call__
        _mt.BlocksToBatchesMapTransformFn.__call__ = (
            _schema_stable_blocks_to_batches
        )
