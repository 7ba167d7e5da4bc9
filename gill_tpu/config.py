"""Configuration dataclasses.

`GILLConfig` is the TPU-native equivalent of the reference's `GILLArgs`
(see /root/reference/gill/models.py:21-37) and round-trips the serialized
`model_args.json` shipped with reference checkpoints
(/root/reference/checkpoints/gill_opt/model_args.json), so reference
checkpoints remain loadable.

`TrainConfig` carries the trainer flags (reference: main.py:57-170 argparse).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Tuple


# Known model-size ladder (reference: main.py:51-52). Sizes are architecture
# presets so no network access is needed: (hidden, ffn, layers, heads,
# word_embed_proj_dim, vocab).
OPT_PRESETS = {
    "facebook/opt-125m": dict(hidden_size=768, ffn_dim=3072, num_layers=12,
                              num_heads=12, word_embed_proj_dim=768,
                              vocab_size=50272, max_positions=2048,
                              do_layer_norm_before=True),
    "facebook/opt-350m": dict(hidden_size=1024, ffn_dim=4096, num_layers=24,
                              num_heads=16, word_embed_proj_dim=512,
                              vocab_size=50272, max_positions=2048,
                              do_layer_norm_before=False),
    "facebook/opt-1.3b": dict(hidden_size=2048, ffn_dim=8192, num_layers=24,
                              num_heads=32, word_embed_proj_dim=2048,
                              vocab_size=50272, max_positions=2048,
                              do_layer_norm_before=True),
    "facebook/opt-2.7b": dict(hidden_size=2560, ffn_dim=10240, num_layers=32,
                              num_heads=32, word_embed_proj_dim=2560,
                              vocab_size=50272, max_positions=2048,
                              do_layer_norm_before=True),
    "facebook/opt-6.7b": dict(hidden_size=4096, ffn_dim=16384, num_layers=32,
                              num_heads=32, word_embed_proj_dim=4096,
                              vocab_size=50272, max_positions=2048,
                              do_layer_norm_before=True),
    "facebook/opt-13b": dict(hidden_size=5120, ffn_dim=20480, num_layers=40,
                             num_heads=40, word_embed_proj_dim=5120,
                             vocab_size=50272, max_positions=2048,
                             do_layer_norm_before=True),
    "facebook/opt-30b": dict(hidden_size=7168, ffn_dim=28672, num_layers=48,
                             num_heads=56, word_embed_proj_dim=7168,
                             vocab_size=50272, max_positions=2048,
                             do_layer_norm_before=True),
    "facebook/opt-66b": dict(hidden_size=9216, ffn_dim=36864, num_layers=64,
                             num_heads=72, word_embed_proj_dim=9216,
                             vocab_size=50272, max_positions=2048,
                             do_layer_norm_before=True),
    # tiny preset for tests / CI smoke of the full load_gill path
    "test/opt-tiny": dict(hidden_size=16, ffn_dim=32, num_layers=2,
                          num_heads=2, word_embed_proj_dim=16,
                          vocab_size=300, max_positions=96,
                          do_layer_norm_before=True),
}

CLIP_VISION_PRESETS = {
    "openai/clip-vit-base-patch16": dict(hidden_size=768, intermediate_size=3072,
                                         num_layers=12, num_heads=12,
                                         image_size=224, patch_size=16),
    "openai/clip-vit-base-patch32": dict(hidden_size=768, intermediate_size=3072,
                                         num_layers=12, num_heads=12,
                                         image_size=224, patch_size=32),
    "openai/clip-vit-large-patch14": dict(hidden_size=1024, intermediate_size=4096,
                                          num_layers=24, num_heads=16,
                                          image_size=224, patch_size=14),
    "test/clip-tiny": dict(hidden_size=16, intermediate_size=32,
                           num_layers=1, num_heads=2, image_size=16,
                           patch_size=8),
}


@dataclasses.dataclass
class OPTConfig:
    """Architecture of an OPT decoder (frozen backbone)."""
    vocab_size: int = 50272
    hidden_size: int = 4096
    ffn_dim: int = 16384
    num_layers: int = 32
    num_heads: int = 32
    word_embed_proj_dim: int = 4096
    max_positions: int = 2048
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5
    # Learned positional embeddings are offset by 2 (HF OPT convention).
    position_offset: int = 2

    @classmethod
    def from_name(cls, name: str, vocab_size: Optional[int] = None) -> "OPTConfig":
        if name not in OPT_PRESETS:
            raise ValueError(f"Unknown OPT preset {name!r}")
        kw = dict(OPT_PRESETS[name])
        if vocab_size is not None:
            kw["vocab_size"] = vocab_size
        return cls(**kw)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass
class CLIPVisionConfig:
    """Architecture of a CLIP ViT vision tower (frozen backbone)."""
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_name(cls, name: str) -> "CLIPVisionConfig":
        if name not in CLIP_VISION_PRESETS:
            raise ValueError(f"Unknown CLIP vision preset {name!r}")
        return cls(**CLIP_VISION_PRESETS[name])

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + [CLS]


@dataclasses.dataclass
class GILLConfig:
    """Model hyperparameters; round-trips reference `model_args.json`.

    Mirrors GILLArgs (reference gill/models.py:21-37) plus the extra keys
    found in shipped checkpoints ("share_ret_gen", "norm_image_embed").
    """
    opt_version: str = "facebook/opt-6.7b"
    visual_encoder: str = "openai/clip-vit-large-patch14"
    freeze_lm: bool = True
    freeze_vm: bool = True
    n_visual_tokens: int = 4
    task: str = "captioning"
    ret_emb_dim: int = 256
    gen_emb_dim: int = 768
    text_emb_layers: Tuple[int, ...] = (-1,)
    gen_token_idx: Tuple[int, ...] = (0,)
    retrieval_token_idx: Tuple[int, ...] = (0,)
    text_fc_mode: str = "gill_mapper"
    ret_text_fc_mode: str = "linear"
    num_tokens: int = 8
    num_clip_tokens: int = 77
    share_ret_gen: bool = True
    norm_image_embed: str = "none"

    # TPU-native extras (not in the reference; safe defaults keep JSON compat).
    max_len: int = 32                 # training sequence length (captions)
    image_size: int = 224

    _EXTRA_KEYS = ("max_len", "image_size")

    def to_json(self, path: Optional[str] = None) -> str:
        d = dataclasses.asdict(self)
        # Serialize in the reference's format (lists, not tuples).
        for k in ("text_emb_layers", "gen_token_idx", "retrieval_token_idx"):
            d[k] = list(d[k])
        s = json.dumps(d, indent=4)
        if path is not None:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str: str) -> "GILLConfig":
        if path_or_str.lstrip().startswith("{"):
            d = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in known:
                continue  # forward/backward compat: ignore unknown keys
            if k in ("text_emb_layers", "gen_token_idx", "retrieval_token_idx"):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    @property
    def opt(self) -> OPTConfig:
        return OPTConfig.from_name(self.opt_version)

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_name(self.visual_encoder)


@dataclasses.dataclass
class TrainConfig:
    """Trainer flags (reference: main.py argparse, ~45 flags)."""
    dataset: str = "cc3m"
    val_dataset: str = "cc3m"
    dataset_dir: str = "datasets"
    image_dir: str = "data/"
    log_base_dir: str = "./runs"
    exp_name: str = "gill_tpu"

    epochs: int = 10
    steps_per_epoch: int = 2000
    start_epoch: int = 0
    val_steps_per_epoch: int = -1
    batch_size: int = 200
    val_batch_size: Optional[int] = None
    lr: float = 1e-3
    lr_warmup_steps: int = 2000
    lr_schedule_step_size: int = 5       # epochs between LR decays
    lr_schedule_gamma: float = 0.1
    grad_accumulation_steps: int = 1
    grad_clip: float = 1.0
    precision: str = "bf16"              # fp32 | bf16
    cap_loss_scale: float = 1.0
    ret_loss_scale: float = 1.0
    gen_loss_scale: float = 1.0
    concat_captions_prob: float = 0.5
    input_prompt: str = "A picture of"
    max_len: int = 32
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.01
    print_freq: int = 10
    resume: str = ""
    evaluate: bool = False
    seed: Optional[int] = None
    workers: int = 4

    # Rematerialize each frozen-LM layer in the train forwards (backward
    # recomputes instead of storing intermediates). Required for OPT-6.7B on
    # 16GB chips (ROADMAP memory plan); off by default — small models train
    # faster without it.
    remat: bool = False

    # Mesh layout: (data, model). model>1 enables tensor parallelism over the
    # frozen LM; the reference only supported pure DP (main.py:321-326).
    dp_size: int = -1                    # -1 = all devices on the data axis
    tp_size: int = 1

    def to_json(self, path: Optional[str] = None) -> str:
        s = json.dumps(dataclasses.asdict(self), indent=4)
        if path is not None:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str: str) -> "TrainConfig":
        if path_or_str.lstrip().startswith("{"):
            d = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
