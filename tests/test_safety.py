"""Safety checker tests: torch golden for the CLIP tower + projection, and a
numpy port of the diffusers threshold logic (the component the reference runs
after SD decode, /root/reference/gill/custom_sd.py:653-661)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import CLIPVisionConfig
from gill_tpu.models import safety
from gill_tpu.weights.convert import safety_checker_from_torch

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VIS = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                       num_heads=4, image_size=32, patch_size=8)
CFG = safety.SafetyCheckerConfig(vision=VIS, projection_dim=16,
                                 num_concepts=5, num_special=2)


def _fake_diffusers_sd(seed=0):
    """Builds a diffusers-layout StableDiffusionSafetyChecker state dict from
    a random torch CLIPVisionModelWithProjection + concept buffers."""
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=VIS.hidden_size, intermediate_size=VIS.intermediate_size,
        num_hidden_layers=VIS.num_layers, num_attention_heads=VIS.num_heads,
        image_size=VIS.image_size, patch_size=VIS.patch_size,
        hidden_act="quick_gelu", projection_dim=CFG.projection_dim)
    torch.manual_seed(seed)
    tm = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("vision_model."):
            sd["vision_model." + k] = v          # diffusers nests the tower
        else:
            sd[k] = v                            # visual_projection.weight
    g = torch.Generator().manual_seed(seed + 1)
    sd["concept_embeds"] = torch.randn(CFG.num_concepts, CFG.projection_dim,
                                       generator=g)
    sd["special_care_embeds"] = torch.randn(CFG.num_special,
                                            CFG.projection_dim, generator=g)
    # thresholds near the cosine range so both flagged and clean cases occur
    sd["concept_embeds_weights"] = torch.rand(CFG.num_concepts,
                                              generator=g) * 0.4
    sd["special_care_embeds_weights"] = torch.rand(CFG.num_special,
                                                   generator=g) * 0.4
    return tm, sd


def _numpy_reference(tm, sd, images_01):
    """diffusers StableDiffusionSafetyChecker.forward in numpy, minus the
    feature extractor (images already at the tower's input size)."""
    mean = np.asarray(safety._MEAN, np.float32)
    std = np.asarray(safety._STD, np.float32)
    px = (images_01 - mean) / std
    with torch.no_grad():
        emb = tm(pixel_values=torch.tensor(
            px.transpose(0, 3, 1, 2))).image_embeds.numpy()

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T

    special = cos(emb, sd["special_care_embeds"].numpy())
    concept = cos(emb, sd["concept_embeds"].numpy())
    flags = []
    for i in range(len(emb)):
        adj = 0.0
        care = False
        for j in range(special.shape[1]):
            if round(float(special[i, j]
                           - sd["special_care_embeds_weights"][j]), 3) > 0:
                care = True
        if care:
            adj = 0.01
        nsfw = False
        for j in range(concept.shape[1]):
            if round(float(concept[i, j] - sd["concept_embeds_weights"][j]
                           + adj), 3) > 0:
                nsfw = True
        flags.append(nsfw)
    return flags


def test_safety_checker_matches_torch_golden():
    tm, sd = _fake_diffusers_sd()
    params = jax.tree_util.tree_map(jnp.asarray,
                                    safety_checker_from_torch(sd, CFG))
    rng = np.random.RandomState(0)
    images = rng.rand(6, VIS.image_size, VIS.image_size, 3).astype(np.float32)

    want = _numpy_reference(tm, sd, images)
    out, got = safety.check_images(params, CFG, jnp.asarray(images))
    got = [bool(f) for f in np.asarray(got)]
    assert got == want
    out = np.asarray(out)
    for i, f in enumerate(got):
        if f:
            assert np.all(out[i] == 0)
        else:
            np.testing.assert_allclose(out[i], images[i], atol=1e-5)

    # Deterministic branch coverage: impossible thresholds -> nothing
    # flagged, images pass through untouched; negative thresholds -> all
    # flagged and blacked out.
    clean = dict(params)
    clean["concept_embeds_weights"] = params["concept_embeds_weights"] + 10.0
    clean["special_care_embeds_weights"] = (
        params["special_care_embeds_weights"] + 10.0)
    out, flags = safety.check_images(clean, CFG, jnp.asarray(images))
    assert not np.any(np.asarray(flags))
    np.testing.assert_allclose(np.asarray(out), images, atol=1e-5)

    hot = dict(params)
    hot["concept_embeds_weights"] = params["concept_embeds_weights"] - 10.0
    out, flags = safety.check_images(hot, CFG, jnp.asarray(images))
    assert np.all(np.asarray(flags))
    assert np.all(np.asarray(out) == 0)


def test_safety_checker_callable_in_pipeline():
    """The SafetyChecker object plugs into the SD pipeline hook."""
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod

    cfg = safety.tiny_safety_config()
    checker = safety.SafetyChecker(cfg, safety.init(jax.random.PRNGKey(0), cfg))

    sd_cfg = tiny_sd_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = {"unet": unet_mod.init(k1, sd_cfg.unet),
              "vae_decoder": vae_mod.init_decoder(k2, sd_cfg.vae)}
    pipe = StableDiffusionPipeline(sd_cfg, params, safety_checker=checker)
    emb = jnp.zeros((2, sd_cfg.text.max_positions,
                     sd_cfg.unet.cross_attention_dim), jnp.float32)
    img = pipe(prompt_embeds=emb, num_inference_steps=2, guidance_scale=1.0)
    assert img.shape == (2, sd_cfg.default_size, sd_cfg.default_size, 3)
    assert np.all(np.isfinite(np.asarray(img)))
