"""Generate the last image of VIST stories with GILL-TPU.

Protocol parity: reference evals/generate_vist_images.py — interleaved
(caption, image) context from the first n-1 story steps, then
generate_for_images_and_texts(num_words=2, gen_scale_factor=1e5, seed 42)
forces an [IMG] and the generated image is saved as <gt_image_id>.png.

Example:
  python evals/generate_vist_images.py gill_vist_outputs \
      --model-dir checkpoints/gill_opt --vist-dir sis/
"""

import argparse
import json
import os
import sys

from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--model-dir", default="checkpoints/gill_opt")
    p.add_argument("--vist-dir", default="sis")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--batch", type=int, default=1,
                   help="stories decoded concurrently over the "
                        "continuous-batching engine (>1 uses "
                        "generate_for_images_and_texts_batch; greedy "
                        "tokens are proven identical to the sequential "
                        "path — tests/test_api.py; pixels match to "
                        "float tolerance)")
    args = p.parse_args()

    import jax

    from gill_tpu.api import load_gill

    os.makedirs(args.output_dir, exist_ok=True)
    image_dir = os.path.join(args.vist_dir, "val_images")
    with open(os.path.join(args.vist_dir, "val_formatted.json")) as f:
        vist_data = json.load(f)

    model = load_gill(args.model_dir, load_ret_embs=False,
                      weights_dir=args.weights_dir)
    rng = jax.random.PRNGKey(42)

    items = list(vist_data["annotations"].items())
    if args.limit > 0:
        items = items[: args.limit]

    def build_prompts(story_id, story_data):
        image_paths = [os.path.join(image_dir, s["image_id"] + ".png")
                       for s in story_data][:-1]
        if not all(os.path.exists(pth) for pth in image_paths):
            print(f"Missing images; skipping story {story_id}")
            return None, None
        captions = [s["caption"] for s in story_data]
        input_data = []
        for i, caption in enumerate(captions):
            input_data.append(caption)
            if i < len(captions) - 1:
                with open(image_paths[i], "rb") as f:
                    input_data.append(
                        Image.open(f).convert("RGB").resize((224, 224)))
        return input_data, story_data[-1]["image_id"]

    kw = dict(num_words=2, gen_scale_factor=1e5, generator=rng,
              num_inference_steps=args.num_inference_steps)
    n_saved = 0

    def save(outs, gt_image_id):
        nonlocal n_saved
        gen_img = outs[1]["gen"][0][0]
        out_path = os.path.join(args.output_dir, f"{gt_image_id}.png")
        gen_img.save(out_path)
        if n_saved < 3:
            print("Saved", out_path)
        n_saved += 1

    if args.batch > 1:
        # decode many stories concurrently over the slot pool; greedy
        # tokens are identical to the sequential path
        for lo in range(0, len(items), args.batch):
            prompts, ids = [], []
            for story_id, story_data in items[lo: lo + args.batch]:
                input_data, gt_id = build_prompts(story_id, story_data)
                if input_data is not None:
                    prompts.append(input_data)
                    ids.append(gt_id)
            if not prompts:
                continue
            all_outs = model.generate_for_images_and_texts_batch(
                prompts, slots=min(8, len(prompts)), **kw)
            for outs, gt_id in zip(all_outs, ids):
                save(outs, gt_id)
    else:
        for story_id, story_data in items:
            input_data, gt_id = build_prompts(story_id, story_data)
            if input_data is None:
                continue
            outs = model.generate_for_images_and_texts(input_data, **kw)
            save(outs, gt_id)


if __name__ == "__main__":
    main()
