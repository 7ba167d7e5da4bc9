"""Stable Diffusion safety checker (TPU-native).

Parity target: the `StableDiffusionSafetyChecker` the reference runs after
VAE decode (/root/reference/gill/custom_sd.py:653-661; diffusers
`stable_diffusion/safety_checker.py`): a CLIP ViT-L/14 image tower +
visual projection scores each decoded image against 17 NSFW "concept"
embeddings and 3 "special care" embeddings; cosine similarity above a
per-concept threshold (with a +0.01 adjustment once any special-care concept
fires) flags the image, which is then blacked out.

Everything runs on device: resize + CLIP-normalize + ViT + the concept
scoring are one jit; only the boolean flags cross to host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gill_tpu.config import CLIPVisionConfig
from gill_tpu.models import clip as clip_mod

# CLIP image normalization (OpenAI constants; diffusers CLIPImageProcessor).
_MEAN = (0.48145466, 0.4578275, 0.40821073)
_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class SafetyCheckerConfig:
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=lambda: CLIPVisionConfig.from_name(
            "openai/clip-vit-large-patch14"))
    projection_dim: int = 768
    num_concepts: int = 17
    num_special: int = 3


def tiny_safety_config() -> SafetyCheckerConfig:
    return SafetyCheckerConfig(
        vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_layers=1, num_heads=2, image_size=16,
                                patch_size=8),
        projection_dim=8, num_concepts=4, num_special=2)


def init(key, cfg: SafetyCheckerConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    vision = clip_mod.init_vision(k1, cfg.vision, dtype)
    d = cfg.vision.hidden_size
    vision["visual_projection"] = {
        "w": jax.random.normal(k2, (d, cfg.projection_dim), dtype) * 0.02}
    return {
        "vision": vision,
        "concept_embeds": jax.random.normal(
            k3, (cfg.num_concepts, cfg.projection_dim), dtype),
        "special_care_embeds": jax.random.normal(
            k4, (cfg.num_special, cfg.projection_dim), dtype),
        "concept_embeds_weights": jnp.full((cfg.num_concepts,), 0.2, dtype),
        "special_care_embeds_weights": jnp.full((cfg.num_special,), 0.2,
                                                dtype),
    }


def _cosine(a, b):
    """diffusers' cosine_distance: normalized a @ normalized b.T."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


def _round3(x):
    # diffusers rounds scores to 3 decimals before thresholding.
    return jnp.round(x * 1000.0) / 1000.0


def check_images(params, cfg: SafetyCheckerConfig, images):
    """The reference's run_safety_checker: returns (images, has_nsfw) where
    flagged images are replaced with black (diffusers zeroes them).
    Pure function of (params, images) for a fixed cfg — jit via
    SafetyChecker below."""
    b = images.shape[0]
    sz = cfg.vision.image_size
    px = jax.image.resize(images.astype(jnp.float32), (b, sz, sz, 3),
                          method="bicubic")
    px = (px - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    pooled = clip_mod.vision_forward(params["vision"], cfg.vision,
                                     px)["pooler_output"]
    image_embeds = pooled @ params["vision"]["visual_projection"]["w"]

    special_cos = _cosine(image_embeds.astype(jnp.float32),
                          params["special_care_embeds"].astype(jnp.float32))
    concept_cos = _cosine(image_embeds.astype(jnp.float32),
                          params["concept_embeds"].astype(jnp.float32))

    special_scores = _round3(
        special_cos - params["special_care_embeds_weights"][None, :])
    special_care = (special_scores > 0).any(axis=1)
    adjustment = jnp.where(special_care, 0.01, 0.0)[:, None]
    concept_scores = _round3(
        concept_cos - params["concept_embeds_weights"][None, :] + adjustment)
    has_nsfw = (concept_scores > 0).any(axis=1)

    images = jnp.where(has_nsfw[:, None, None, None],
                       jnp.zeros_like(images), images)
    return images, has_nsfw


class SafetyChecker:
    """Callable matching the SD pipeline's safety hook signature
    (gill_tpu/models/sd/pipeline.py): images -> (images, has_nsfw list)."""

    def __init__(self, cfg: SafetyCheckerConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._fn = jax.jit(lambda p, im: check_images(p, cfg, im))

    def __call__(self, images):
        import numpy as np

        out, flags = self._fn(self.params, images)
        flags = [bool(f) for f in np.asarray(flags)]
        if any(flags):
            print("Potential NSFW content was detected in one or more "
                  "images. A black image will be returned instead.")
        return out, flags


def load_safety_checker(path: str, dtype=jnp.float32) -> SafetyChecker:
    """Builds a SafetyChecker from a diffusers `safety_checker/` directory
    (state dict with vision_model.* / visual_projection / concept buffers)."""
    from gill_tpu.weights.convert import safety_checker_from_torch
    from gill_tpu.weights.loader import load_state_dict_dir

    sd = load_state_dict_dir(path)
    cfg = SafetyCheckerConfig()
    params = jax.tree_util.tree_map(
        jnp.asarray, safety_checker_from_torch(sd, cfg))
    if dtype is not None:
        from gill_tpu.nn.core import cast_tree

        params = cast_tree(params, dtype)
    return SafetyChecker(cfg, params)
