"""scripts/validate_real_weights.py (VERDICT r3 #3): every check must
(a) SKIP with an explicit reason when its assets are absent — the state
of this zero-weight environment — and (b) PASS against synthetic assets
in the exact on-disk formats the real ones will arrive in (HF
save_pretrained dirs, diffusers-layout SD dirs, vocab.json/merges.txt,
LPIPS npz, CC3M TSV)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
SCRIPT = os.path.join(HERE, "..", "scripts", "validate_real_weights.py")


@pytest.fixture(scope="module")
def vrw():
    spec = importlib.util.spec_from_file_location("validate_real_weights",
                                                  SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def _no_env_assets(monkeypatch):
    monkeypatch.delenv("GILL_TPU_WEIGHTS_DIR", raising=False)
    monkeypatch.delenv("GILL_TPU_TOKENIZER_DIR", raising=False)
    monkeypatch.delenv("GILL_TPU_LPIPS_WEIGHTS", raising=False)


def test_all_checks_skip_without_assets(vrw, tmp_path):
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--weights-dir", empty, "--tokenizer-dir", empty, "--out", out]))
    assert rc == 0
    report = json.load(open(out))
    assert set(report["results"]) == set(vrw.CHECKS)
    for name, res in report["results"].items():
        assert res["status"] == "SKIPPED", (name, res)
        assert res["reason"], name
    assert report["summary"]["FAIL"] == 0
    assert report["summary"]["SKIPPED"] == len(vrw.CHECKS)


def test_tokenizer_check_passes_on_fixture(vrw, tmp_path):
    pytest.importorskip("transformers")
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "tokenizer", "--out", out,
         "--tokenizer-dir", os.path.join(HERE, "fixtures", "tok")]))
    assert rc == 0
    res = json.load(open(out))["results"]["tokenizer"]
    assert res["status"] == "PASS", res
    assert res["img_tokens_ok"]


def test_opt_check_passes_on_synthetic_hf_dir(vrw, tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from gill_tpu.config import OPTConfig

    cfg = OPTConfig.from_name("test/opt-tiny")
    hf_cfg = transformers.OPTConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        word_embed_proj_dim=cfg.word_embed_proj_dim,
        max_position_embeddings=cfg.max_positions,
        do_layer_norm_before=cfg.do_layer_norm_before,
        dropout=0.0, attention_dropout=0.0, activation_function="relu")
    torch.manual_seed(0)
    model = transformers.OPTForCausalLM(hf_cfg).eval()
    d = str(tmp_path / "w" / "opt-tiny")
    model.save_pretrained(d)
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "opt", "--opt-name", "test/opt-tiny",
         "--weights-dir", str(tmp_path / "w"), "--out", out]))
    assert rc == 0
    res = json.load(open(out))["results"]["opt"]
    assert res["status"] == "PASS", res
    assert res["max_abs_logits_delta"] < res["tol"]


def test_clip_check_passes_on_synthetic_hf_dir(vrw, tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from gill_tpu.config import CLIPVisionConfig

    cfg = CLIPVisionConfig.from_name("test/clip-tiny")
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=8)
    torch.manual_seed(1)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    d = str(tmp_path / "w" / "clip-tiny")
    model.save_pretrained(d)
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "clip", "--clip-name", "test/clip-tiny",
         "--weights-dir", str(tmp_path / "w"), "--out", out]))
    assert rc == 0
    res = json.load(open(out))["results"]["clip"]
    assert res["status"] == "PASS", res


def test_sd_check_passes_on_synthetic_diffusers_dir(vrw, tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, HERE)
    from test_sd_full_torch import TorchUNet, TorchVAEDecoder

    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod

    torch.manual_seed(2)
    tu = TorchUNet(unet_mod.tiny_unet_config()).eval()
    tv = TorchVAEDecoder(vae_mod.tiny_vae_config()).eval()
    ud = str(tmp_path / "sd" / "unet")
    vd = str(tmp_path / "sd" / "vae")
    os.makedirs(ud)
    os.makedirs(vd)
    torch.save({k: v.detach() for k, v in
                tu.state_dict_diffusers().items()},
               os.path.join(ud, "pytorch_model.bin"))
    torch.save({k: v.detach() for k, v in tv.state_dict().items()},
               os.path.join(vd, "pytorch_model.bin"))
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "sd", "--sd-dir", str(tmp_path / "sd"),
         "--sd-config", "tiny", "--out", out]))
    assert rc == 0
    res = json.load(open(out))["results"]["sd"]
    assert res["status"] == "PASS", res
    assert res["finite"]


def test_lpips_check_passes_on_synthetic_npz(vrw, tmp_path):
    rng = np.random.RandomState(5)
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
             (256, 256, 3)]
    blobs = {}
    for i, (cin, cout, k) in enumerate(chans):
        blobs[f"conv{i}_w"] = (rng.randn(k, k, cin, cout) * 0.05
                               ).astype(np.float32)
        blobs[f"conv{i}_b"] = np.zeros(cout, np.float32)
        blobs[f"lin{i}_w"] = rng.rand(cout).astype(np.float32)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **blobs)
    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "lpips", "--lpips-weights", path, "--out", out]))
    assert rc == 0
    res = json.load(open(out))["results"]["lpips"]
    assert res["status"] == "PASS", res
    assert res["d_noised"] > res["d_identical"]


def test_specdec_check_passes_on_synthetic_assets(vrw, tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from gill_tpu.config import OPTConfig
    from gill_tpu.tokenizer import bytes_to_unicode

    cfg = OPTConfig.from_name("test/opt-tiny")
    hf_cfg = transformers.OPTConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        word_embed_proj_dim=cfg.word_embed_proj_dim,
        max_position_embeddings=cfg.max_positions,
        do_layer_norm_before=cfg.do_layer_norm_before,
        dropout=0.0, attention_dropout=0.0, activation_function="relu")
    torch.manual_seed(3)
    d = str(tmp_path / "w" / "opt-tiny")
    transformers.OPTForCausalLM(hf_cfg).eval().save_pretrained(d)

    # byte-only vocab (all ids < 256 < the model's 300) + empty merges
    tokdir = str(tmp_path / "tok")
    os.makedirs(tokdir)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(os.path.join(tokdir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tokdir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tsv = str(tmp_path / "caps.tsv")
    with open(tsv, "w") as f:
        f.write("caption\timage\n")
        for i in range(3):
            f.write(f"a tiny caption number {i}\timg{i}.jpg\n")

    out = str(tmp_path / "report.json")
    rc = vrw.run(vrw.parse_args(
        ["--only", "specdec", "--opt-name", "test/opt-tiny",
         "--draft-name", "test/opt-tiny",
         "--weights-dir", str(tmp_path / "w"),
         "--tokenizer-dir", tokdir, "--cc3m-tsv", tsv,
         "--n-captions", "2", "--spec-k", "4", "--out", out]))
    assert rc == 0
    res = json.load(open(out))["results"]["specdec"]
    assert res["status"] == "PASS", res
    # self-drafting: the draft IS the target, so every refutable draft
    # position must be accepted
    assert res["acceptance_rate"] == pytest.approx(1.0), res
