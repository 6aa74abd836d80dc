"""Functional layer library.

TPU-first replacement for the reference's ``vllm/model_executor/layers/``:
instead of nn.Modules owning TP process-group collectives
(ColumnParallelLinear/RowParallelLinear, vllm/model_executor/layers/
linear.py), layers here are pure functions over param pytrees whose
sharding is declared with ``jax.sharding.PartitionSpec`` — XLA inserts the
ICI collectives that the reference hand-codes with NCCL.
"""
