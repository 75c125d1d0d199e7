"""Differentiable rendering (TPU-native replacement for neural_renderer /
pytorch3d CUDA rasterizers — SURVEY.md §2.12)."""

from soccerplayershapepose_tpu.render.softras import (  # noqa: F401
    soft_silhouette, render_silhouette, hard_silhouette)
