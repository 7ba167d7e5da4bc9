"""Filter PartiPrompts decision annotations to confident examples.

Protocol parity: reference scripts/process_p2_annotations.py — keep the
majority vote when >=4/5 annotators agree (or 3 with <=1 dissent), else
label 'same'; writes PartiPromptsDecisionsConfident.tsv.

Example:
  python scripts/process_p2_annotations.py \
      --in data/PartiPromptsAllDecisions_Alignment.tsv \
      --out data/PartiPromptsDecisionsConfident.tsv
"""

import argparse
import collections


def majority_vote(votes):
    counts = collections.Counter(votes)
    if (counts["gen"] >= 4 or counts["ret"] >= 4) or \
            (counts["gen"] == 3 and counts["ret"] <= 1) or \
            (counts["ret"] == 3 and counts["gen"] <= 1):
        return counts.most_common(1)[0][0]
    return "same"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="inp",
                   default="data/PartiPromptsAllDecisions_Alignment.tsv")
    p.add_argument("--out",
                   default="data/PartiPromptsDecisionsConfident.tsv")
    args = p.parse_args()

    with open(args.inp) as f:
        lines = f.readlines()

    votes_per_row = {}
    for i in range(1, len(lines)):
        votes_per_row[i] = lines[i].split("\t")[-1].strip().split(",")
    id2vote = {i: majority_vote(v) for i, v in votes_per_row.items()}
    print(collections.Counter(id2vote.values()))

    with open(args.out, "w") as wf:
        wf.write(lines[0].replace("\tDecisions\n", "\tDecision\n"))
        for i in range(1, len(lines)):
            cols = lines[i].split("\t")[:-1]
            wf.write("\t".join(cols) + f"\t{id2vote[i]}\n")


if __name__ == "__main__":
    main()
