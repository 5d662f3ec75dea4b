"""Renderers: differentiable splat frontend + mesh-overlay rasterizer."""
