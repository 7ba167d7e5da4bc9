"""Scripted equivalent of the reference's GILL_Inference_Examples.ipynb:
fixed-seed (1337) greedy demonstrations of the three output routes.

Example:
  python examples/inference_examples.py --model-dir checkpoints/gill_opt \
      --image example.jpg --out-dir example_outputs
"""

import argparse
import os
import sys

from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", default="checkpoints/gill_opt")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--image", default=None, help="optional context image")
    p.add_argument("--out-dir", default="example_outputs")
    args = p.parse_args()

    import jax

    from gill_tpu.api import load_gill

    os.makedirs(args.out_dir, exist_ok=True)
    model = load_gill(args.model_dir, weights_dir=args.weights_dir)
    rng = jax.random.PRNGKey(1337)

    def show(outs, tag):
        print(f"--- {tag} ---")
        for o in outs:
            if isinstance(o, str):
                print("text:", o)
            else:
                print("decision:", o["decision"])
                for i, (img, *_rest) in enumerate(o["ret"]):
                    img.save(os.path.join(args.out_dir, f"{tag}_ret{i}.png"))
                for i, (img, score) in enumerate(o["gen"]):
                    if isinstance(img, Image.Image):
                        img.save(os.path.join(args.out_dir,
                                              f"{tag}_gen{i}.png"))

    # 1. Image captioning / QA (text route).
    prompts = []
    if args.image:
        prompts.append(Image.open(args.image).resize((224, 224)).convert("RGB"))
    prompts.append("Q: What would make a nice caption for this?\nA:")
    show(model.generate_for_images_and_texts(
        prompts, num_words=32, min_word_tokens=8, generator=rng), "caption")

    # 2. Forced image output (retrieval-or-generation route).
    show(model.generate_for_images_and_texts(
        ["a watercolor painting of a lighthouse at sunset"],
        num_words=2, gen_scale_factor=1e5, generator=rng,
        num_inference_steps=50), "forced_image")

    # 3. Free multimodal dialogue turn with a mild [IMG] boost.
    show(model.generate_for_images_and_texts(
        ["Q: show me something similar but at night\nA:"],
        num_words=32, ret_scale_factor=1.3, generator=rng), "dialogue")

    # 4. Log-likelihood scoring.
    s = model.get_log_likelihood_scores(prompts)
    print("log-likelihood of the caption prompt:", s)


if __name__ == "__main__":
    main()
