#!/usr/bin/env python3
"""Independent BPE re-derivation for the q134 golden oracle and BpeSpec.

Implements Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of
Rare Words with Subword Units") from the paper alone — NOT a port of the
Scala trainer — under the engine's determinism contract:

  * a word is its sequence of Unicode code points + a trailing '</w>';
  * each step merges the most frequent adjacent pair;
  * ties break to the lexicographically smallest (lhs, rhs) under UTF-8
    byte order;
  * stop at num_merges merges or when the best pair's count < min_count.

Prints the expected merges table for the planted corpus used by
q134_bpe_train_golden and by BpeSpec's golden test, plus the expected
encoding of a few probe words. Run it whenever either changes; paste the
output into both places.
"""
from collections import Counter


def word_symbols(word):
    return [c for c in word] + ["</w>"]  # python str iter = code points


def pair_key(pair):
    return (pair[0].encode("utf-8"), pair[1].encode("utf-8"))


def train(word_counts, num_merges, min_count=2):
    words = {w: word_symbols(w) for w, _ in word_counts}
    freq = dict(word_counts)
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], pair_key(kv[0])))
        if best[1] < min_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def encode(word, merges):
    rank = {p: i for i, p in enumerate(merges)}
    syms = word_symbols(word)
    while len(syms) > 1:
        ranked = [(rank[(a, b)], i) for i, (a, b) in
                  enumerate(zip(syms, syms[1:])) if (a, b) in rank]
        if not ranked:
            break
        r, _ = min(ranked)
        l, rr = merges[r]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                out.append(l + rr)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def vocab(word_counts, merges):
    """Token-id assignment: <unk>=0, then the alphabet (every initial
    symbol of every corpus word) in UTF-8 byte order, then each merge's
    product in merge order, duplicates keeping their FIRST id."""
    alpha = sorted({s for w, _ in word_counts for s in word_symbols(w)},
                   key=lambda s: s.encode("utf-8"))
    out, seen = [], set()
    for t in ["<unk>"] + alpha + [l + r for l, r in merges]:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def pack_padded(doc_ids_stream, seq_len, pad_id):
    """Expected pack_sequences emit=input_ids + padId + emitMask layout
    for the q144 golden oracle: documents laid end-to-end in id order,
    cut every seq_len ids, the final short sequence padded with pad_id
    and every row carrying the 1/0 attention mask. Independent
    re-derivation (plain slicing), not the engine's prefix-sum."""
    stream, bounds = [], []
    for doc_id, ids in doc_ids_stream:
        bounds.append((len(stream), len(stream) + len(ids)))
        stream.extend(ids)
    out = []
    for s in range(0, len(stream), seq_len):
        ids = stream[s:s + seq_len]
        w = len(ids)
        n_docs = sum(1 for a, b in bounds if a < s + w and b > s and a != b)
        out.append((s // seq_len, ids + [pad_id] * (seq_len - w),
                    [1] * w + [0] * (seq_len - w), n_docs, w))
    return out


if __name__ == "__main__":
    # the planted q134 corpus: the classic subword-paper word mixture
    corpus = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train(corpus, num_merges=6, min_count=2)
    print("merges (rank, lhs, rhs):")
    for i, (l, r) in enumerate(merges):
        print(f"  ({i}, '{l}', '{r}')")
    for probe in ["lowest", "low", "newest", "wider"]:
        print(f"encode({probe!r}) = {encode(probe, merges)}")
    v = vocab(corpus, merges)
    print("vocab (token_id, token):")
    for i, t in enumerate(v):
        print(f"  ({i}, '{t}')")
    ids = {t: i for i, t in enumerate(v)}
    for probe in ["lowest", "low", "newest", "zap"]:
        print(f"ids({probe!r}) = {[ids.get(t, 0) for t in encode(probe, merges)]}")

    # q144 golden: the q134 corpus as 4 documents, packed at seqLen=7
    # with padId=-1 and the attention mask
    docs = [(1, "low low low low low"), (2, "lower lower"),
            (3, "newest newest newest newest newest newest"),
            (4, "widest widest widest")]
    def doc_ids(text):
        return [ids.get(t, 0) for w in text.split() for t in encode(w, merges)]
    packed = pack_padded([(d, doc_ids(t)) for d, t in docs],
                         seq_len=7, pad_id=-1)
    print("packed (seq_id, ids_csv, mask_csv, n_docs, seq_weight):")
    for seq_id, ids_row, mask, n_docs, w in packed:
        print(f"  ({seq_id}, '{','.join(map(str, ids_row))}', "
              f"'{','.join(map(str, mask))}', {n_docs}, {w}),")
