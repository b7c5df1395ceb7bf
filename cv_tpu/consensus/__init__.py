"""Batched sample-consensus (RANSAC/ARRSAC-style) model estimation."""

from .batch import BatchConsensus, Estimator

__all__ = ["BatchConsensus", "Estimator"]
