"""Perceptual + image metrics (LPIPS, PSNR/SSIM re-exports)."""

from gaussianavatars_tpu.metrics_lib.lpips import LPIPS, lpips_available
