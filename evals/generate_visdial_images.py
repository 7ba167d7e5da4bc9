"""Generate images from VisDial dialogue contexts with GILL-TPU.

Protocol parity: reference evals/generate_visdial_images.py — the dialogue
is joined as "Q: ...?\nA: ..." lines and a forced-[IMG] generation
(num_words=2, gen_scale_factor=1e5, seed 42) produces one image per
dialogue, saved as the zero-padded image_id.

Example:
  python evals/generate_visdial_images.py gill_visdial_outputs \
      --visdial-dir VisualDialog/ --model-dir checkpoints/gill_opt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--model-dir", default="checkpoints/gill_opt")
    p.add_argument("--visdial-dir", default="VisualDialog")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--batch", type=int, default=1,
                   help="dialogs decoded concurrently over the "
                        "continuous-batching engine")
    args = p.parse_args()

    import jax

    from gill_tpu.api import load_gill

    os.makedirs(args.output_dir, exist_ok=True)
    split = "val"
    with open(os.path.join(args.visdial_dir,
                           f"visdial_1.0_{split}.json")) as f:
        visdial_data = json.load(f)
    with open(os.path.join(
            args.visdial_dir,
            f"visdial_1.0_{split}_dense_annotations.json")) as f:
        dense_data = json.load(f)
    assert len(dense_data) == len(visdial_data["data"]["dialogs"])

    questions = visdial_data["data"]["questions"]
    answers = visdial_data["data"]["answers"]
    dialogs = visdial_data["data"]["dialogs"]

    model = load_gill(args.model_dir, load_ret_embs=False,
                      weights_dir=args.weights_dir)
    rng = jax.random.PRNGKey(42)

    n = len(dialogs) if args.limit <= 0 else min(args.limit, len(dialogs))

    def context_of(idx):
        dialog = dialogs[idx]
        contexts = []
        for turn in dialog["dialog"]:
            contexts.append("Q: " + questions[turn["question"]] + "?")
            contexts.append("A: " + answers[turn["answer"]])
        cond = "\n".join(contexts)
        if idx < 3:
            print(cond)
        return cond, str(dialog["image_id"]).rjust(12, "0")

    kw = dict(num_words=2, gen_scale_factor=1e5, generator=rng,
              num_inference_steps=args.num_inference_steps)
    if args.batch > 1:
        # text-only prompts: decode concurrently over the slot pool
        # (greedy tokens identical to the sequential path; pixels
        # match to float tolerance — see tests/test_evals_e2e.py)
        for lo in range(0, n, args.batch):
            pairs = [context_of(i) for i in range(lo, min(lo + args.batch,
                                                          n))]
            all_outs = model.generate_for_images_and_texts_batch(
                [[c] for c, _ in pairs], slots=min(8, len(pairs)), **kw)
            for outs, (_, image_id) in zip(all_outs, pairs):
                outs[1]["gen"][0][0].save(
                    os.path.join(args.output_dir, f"{image_id}.png"))
    else:
        for idx in range(n):
            cond, image_id = context_of(idx)
            outs = model.generate_for_images_and_texts([cond], **kw)
            outs[1]["gen"][0][0].save(
                os.path.join(args.output_dir, f"{image_id}.png"))


if __name__ == "__main__":
    main()
