"""Train the gen-vs-ret decision classifier on PartiPrompts annotations.

Protocol parity: reference TrainDecisionClassifier.ipynb — for each
confidently-annotated prompt, take the [IMG0] LLM hidden state from a
forward pass of "{prompt}[IMG0..n)", train Dropout(0.5)+Linear(4096,2) with
AdamW lr 1e-3 for 2000 steps, select on macro-F1 (human baseline 0.8511).

Example:
  python scripts/train_decision_classifier.py \
      --annotations data/PartiPromptsDecisionsConfident.tsv \
      --model-dir checkpoints/gill_opt --out decision_model.npz
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LABELS = {"gen": 0, "ret": 1}


def macro_f1(preds, labels, n_classes=2):
    f1s = []
    for c in range(n_classes):
        tp = np.sum((preds == c) & (labels == c))
        fp = np.sum((preds == c) & (labels != c))
        fn = np.sum((preds != c) & (labels == c))
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1s.append(2 * prec * rec / max(prec + rec, 1e-9))
    return float(np.mean(f1s))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--annotations",
                   default="data/PartiPromptsDecisionsConfident.tsv")
    p.add_argument("--model-dir", default="checkpoints/gill_opt")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--out", default="decision_model.npz")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gill_tpu.api import load_gill
    from gill_tpu.models import decision as decision_mod

    prompts, labels = [], []
    with open(args.annotations, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            dec = row["Decision"].strip()
            if dec in LABELS:
                prompts.append(row["Prompt"])
                labels.append(LABELS[dec])
    print(f"{len(prompts)} confident gen/ret examples")

    model = load_gill(args.model_dir, load_ret_embs=False, load_sd=False,
                      weights_dir=args.weights_dir)
    core, params, tok = model.core, model.params, model.tokenizer
    nt = core.cfg.num_tokens
    img_run = "".join(f"[IMG{i}]" for i in range(nt))

    # [IMG0] hidden states via the retrieval-mode forward.
    feats = []
    fwd = jax.jit(lambda p, t, l: core.forward(
        p, jnp.zeros((t.shape[0], core.vis_cfg.image_size,
                      core.vis_cfg.image_size, 3)), t, l,
        mode="retrieval")["llm_hidden"])
    bs, max_len = 16, 64
    for i in range(0, len(prompts), bs):
        chunk = prompts[i:i + bs]
        enc = tok([c + img_run for c in chunk], padding="max_length",
                  truncation=True, max_length=max_len, return_tensors="np")
        lens = enc.attention_mask.sum(axis=1).astype(np.int32)
        hid = fwd(params, jnp.asarray(enc.input_ids), jnp.asarray(lens))
        feats.append(np.asarray(hid[:, 0, :], np.float32))  # [IMG0]
        print(f"features {min(i + bs, len(prompts))}/{len(prompts)}",
              flush=True)
    x = np.concatenate(feats)
    y = np.asarray(labels, np.int32)

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(x))
    n_train = int(len(x) * args.train_frac)
    tr, va = order[:n_train], order[n_train:]

    dp = decision_mod.init(jax.random.PRNGKey(args.seed), in_dim=x.shape[1])
    tx = optax.adamw(args.lr)
    opt_state = tx.init(dp)

    @jax.jit
    def step(dp, opt_state, xb, yb, key):
        def loss_fn(dp):
            logits = decision_mod.apply(dp, xb, train=True, rng=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = tx.update(grads, opt_state, dp)
        return optax.apply_updates(dp, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    best_f1, best_dp = -1.0, dp
    for it in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.choice(k1, len(tr), (min(64, len(tr)),))
        xb = jnp.asarray(x[tr][np.asarray(idx)])
        yb = jnp.asarray(y[tr][np.asarray(idx)])
        dp, opt_state, loss = step(dp, opt_state, xb, yb, k2)
        if (it + 1) % 100 == 0:
            logits = decision_mod.apply(dp, jnp.asarray(x[va]))
            preds = np.asarray(jnp.argmax(logits, -1))
            f1 = macro_f1(preds, y[va])
            print(f"step {it+1}: loss {float(loss):.4f} val macro-F1 {f1:.4f}")
            if f1 > best_f1:
                best_f1, best_dp = f1, dp

    np.savez(args.out, w=np.asarray(best_dp["w"]), b=np.asarray(best_dp["b"]))
    print(f"Saved {args.out} (best val macro-F1 {best_f1:.4f}; human "
          f"baseline 0.8511)")


if __name__ == "__main__":
    main()
