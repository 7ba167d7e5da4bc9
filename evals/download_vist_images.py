"""Format VIST SIS annotations and download the validation images.

Protocol parity: reference evals/download_vist_images.py — reads
sis/val.story-in-sequence.json, writes sis/val_formatted.json
({story_id: [{caption, image_id, sequence_index}]}), and downloads each
used image's url_o to sis/val_images/<image_id>.png (~1h, network-bound).
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gill_tpu.utils.image import get_image_from_url  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vist-json", default="sis/val.story-in-sequence.json")
    p.add_argument("--out-images", default="sis/val_images")
    p.add_argument("--out-formatted", default="sis/val_formatted.json")
    args = p.parse_args()

    os.makedirs(args.out_images, exist_ok=True)
    with open(args.vist_json) as f:
        raw = json.load(f)

    vist = {"annotations": collections.defaultdict(list)}
    used = set()
    for ann in raw["annotations"]:
        assert len(ann) == 1
        ann = ann[0]
        vist["annotations"][ann["story_id"]].append({
            "caption": ann["text"],
            "image_id": ann["photo_flickr_id"],
            "sequence_index": ann["worker_arranged_photo_order"],
        })
        used.add(ann["photo_flickr_id"])

    with open(args.out_formatted, "w") as wf:
        json.dump(vist, wf)

    id2url = {}
    for img in raw["images"]:
        if img["id"] in used and img.get("url_o"):
            id2url[img["id"]] = img["url_o"]

    done = set()
    for story_id, story in vist["annotations"].items():
        for s in story:
            iid = s["image_id"]
            if iid in done:
                continue
            done.add(iid)
            out = os.path.join(args.out_images, f"{iid}.png")
            if iid in id2url and not os.path.exists(out):
                try:
                    get_image_from_url(id2url[iid]).save(out)
                except Exception as e:  # noqa: BLE001
                    print("Error saving image", iid, e)


if __name__ == "__main__":
    main()
