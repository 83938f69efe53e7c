"""Knowledge-graph triple datasets (FB15k-237, WN18RR, and synthetic).

Replaces the reference's DGL-bound loaders (``dgl.contrib.data.load_data``
at search/mr_lp_search.py:51; DGL-KE ``get_dataset`` at
train/mr_lp_train.py:40) with a plain-file loader over the standard
``train.txt / valid.txt / test.txt`` tab-separated ``head rel tail``
format (with optional ``entities.dict / relations.dict`` vocabularies),
plus a deterministic synthetic generator for tests and benchmarks.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class KGDataset:
    name: str
    num_ent: int
    num_rels: int
    train: np.ndarray  # [n, 3] (s, r, o) int64
    valid: np.ndarray
    test: np.ndarray


def _read_dict(path: str) -> dict[str, int]:
    out = {}
    with open(path) as f:
        for line in f:
            idx, name = line.rstrip("\n").split("\t")
            out[name] = int(idx)
    return out


def load_kg_dir(path: str, name: str | None = None) -> KGDataset:
    """Load a KG from a directory of train/valid/test triple files."""
    ent2id: dict[str, int] = {}
    rel2id: dict[str, int] = {}
    if os.path.exists(os.path.join(path, "entities.dict")):
        ent2id = _read_dict(os.path.join(path, "entities.dict"))
        rel2id = _read_dict(os.path.join(path, "relations.dict"))
        frozen = True
    else:
        frozen = False

    def get(d, k):
        if k not in d:
            if frozen:
                raise KeyError(f"unknown symbol {k!r}")
            d[k] = len(d)
        return d[k]

    splits = {}
    for split in ("train", "valid", "test"):
        fp = os.path.join(path, f"{split}.txt")
        rows = []
        with open(fp) as f:
            for line in f:
                h, r, t = line.rstrip("\n").split("\t")
                rows.append((get(ent2id, h), get(rel2id, r), get(ent2id, t)))
        splits[split] = np.asarray(rows, dtype=np.int64)
    return KGDataset(
        name=name or os.path.basename(os.path.normpath(path)),
        num_ent=len(ent2id),
        num_rels=len(rel2id),
        train=splits["train"],
        valid=splits["valid"],
        test=splits["test"],
    )


def synthetic_kg(
    num_ent: int = 200,
    num_rels: int = 11,
    n_train: int = 1000,
    n_valid: int = 100,
    n_test: int = 100,
    seed: int = 0,
    noise: float = 0.15,
) -> KGDataset:
    """Deterministic synthetic KG with a *generalizable* rule.

    Relation r maps an entity of cluster c to the anchor entity of
    cluster (c + r) % k (plus ``noise`` fraction of random objects), so a
    model that infers each subject's cluster from its other triples can
    predict unseen (s, r) pairs — memorization alone scores at chance on
    the test split, a learned structure scores high MRR. Used by tests
    and benchmarks as the offline stand-in for FB15k-237/WN18RR.
    """
    rng = np.random.default_rng(seed)
    k = max(4, num_rels)
    cluster = rng.integers(0, k, size=num_ent)
    anchors = np.array([rng.choice(np.where(cluster == c)[0]) if (cluster == c).any() else 0 for c in range(k)])

    def sample(n):
        s = rng.integers(0, num_ent, size=n)
        r = rng.integers(0, num_rels, size=n)
        o = anchors[(cluster[s] + r) % k].copy()
        noisy = rng.uniform(size=n) < noise
        o[noisy] = rng.integers(0, num_ent, size=int(noisy.sum()))
        return np.stack([s, r, o], axis=1).astype(np.int64)

    total = n_train + n_valid + n_test
    all_t = sample(total)
    all_t = np.unique(all_t, axis=0)
    tries = 0
    while len(all_t) < total and tries < 20:
        all_t = np.unique(np.concatenate([all_t, sample(total)]), axis=0)
        tries += 1
    rng.shuffle(all_t)
    all_t = all_t[:total]
    n_train = min(n_train, len(all_t) - 2)
    n_valid = min(n_valid, (len(all_t) - n_train) // 2)
    return KGDataset(
        name="synthetic",
        num_ent=num_ent,
        num_rels=num_rels,
        train=all_t[:n_train],
        valid=all_t[n_train : n_train + n_valid],
        test=all_t[n_train + n_valid :],
    )


def minikg(
    num_ent: int = 1500,
    n_hubs: int = 48,
    n_hub_rels: int = 8,
    seed: int = 7,
) -> KGDataset:
    """Deterministic mini-KG with FB15k-237-like *relational structure*.

    Unlike :func:`synthetic_kg` (whose anchor rule rewards plain
    embedding lookup — round-1 NOTES.md), this fixture is built so that
    graph structure carries signal:

      * ``num_ent`` leaf entities belong to power-law-sized groups around
        ``n_hubs`` hub entities (degree skew like FB15k-237's head
        entities);
      * r0 ``member_of``: leaf -> its hub;
      * r1 ``same_group``: leaf <-> leaf within a group;
      * r2..r(1+K) hub-level relations: K random hub->hub maps;
      * r(2+K)..r(1+2K) composed relations: leaf -> hub reachable by
        member_of ∘ hub-rel — a 2-hop compositional pattern.

    The valid/test splits hold out composed triples (plus some member_of
    edges), so ranking them rewards models that propagate evidence along
    the graph; memorization scores near chance. All sizes/derivations are
    seeded — the dataset is bit-reproducible with no data download
    (zero-egress stand-in for the real benchmarks; the plain-file loader
    remains the path for actual FB15k-237/WN18RR mounts).
    """
    rng = np.random.default_rng(seed)
    hubs = np.arange(n_hubs)
    leaves = np.arange(n_hubs, num_ent)
    # power-law group sizes
    w = 1.0 / np.arange(1, n_hubs + 1) ** 0.8
    group = rng.choice(n_hubs, size=len(leaves), p=w / w.sum())

    triples: list[tuple[int, int, int]] = []
    # r0 member_of
    for leaf, g in zip(leaves, group):
        triples.append((int(leaf), 0, int(hubs[g])))
    # r1 same_group: ~2 partners per leaf
    for g in range(n_hubs):
        members = leaves[group == g]
        if len(members) < 2:
            continue
        for leaf in members:
            partners = rng.choice(members, size=min(2, len(members) - 1), replace=False)
            for p in partners:
                if p != leaf:
                    triples.append((int(leaf), 1, int(p)))
    # hub-level relations r2..r(1+K): random hub maps
    hub_maps = []
    for k in range(n_hub_rels):
        perm = rng.permutation(n_hubs)
        hub_maps.append(perm)
        for h in range(n_hubs):
            triples.append((int(hubs[h]), 2 + k, int(hubs[perm[h]])))
    # composed relations r(2+K)..: leaf -> hub_maps[k][group(leaf)]
    for k in range(n_hub_rels):
        rid = 2 + n_hub_rels + k
        for leaf, g in zip(leaves, group):
            triples.append((int(leaf), rid, int(hubs[hub_maps[k][g]])))
    # inverse-composed r(2+2K)..: hub' -> member leaves of its preimage
    # hub (leaf-valued answers, so held-out objects are not all hubs and
    # the fresh-BN degree-bias artifact cannot fake a good epoch-0 MRR)
    for k in range(n_hub_rels):
        rid = 2 + 2 * n_hub_rels + k
        for leaf, g in zip(leaves, group):
            triples.append((int(hubs[hub_maps[k][g]]), rid, int(leaf)))

    t = np.asarray(sorted(set(triples)), dtype=np.int64)
    rng.shuffle(t)
    composed = t[:, 1] >= 2 + n_hub_rels
    held = np.zeros(len(t), bool)
    # hold out 15% of composed triples for valid/test
    comp_idx = np.where(composed)[0]
    held_idx = rng.choice(comp_idx, size=int(0.15 * len(comp_idx)), replace=False)
    held[held_idx] = True
    held_rows = t[held]
    rng.shuffle(held_rows)
    n_valid = len(held_rows) // 2
    return KGDataset(
        name="minikg",
        num_ent=num_ent,
        num_rels=2 + 3 * n_hub_rels,
        train=t[~held],
        valid=held_rows[:n_valid],
        test=held_rows[n_valid:],
    )


# published statistics of the reference benchmarks, used to validate a
# mounted dataset the moment it is loaded (DATA.md mount contract; the
# reference's dgl.contrib.data.load_data ships exactly these splits —
# search/mr_lp_search.py:51, train/mr_lp_train.py:37)
KNOWN_DATASETS: dict[str, dict] = {
    "fb15k-237": {
        "dirnames": ("FB15k-237", "fb15k-237", "FB15k237"),
        "num_ent": 14541, "num_rels": 237,
        "splits": {"train": 272115, "valid": 17535, "test": 20466},
    },
    "wn18rr": {
        "dirnames": ("wn18rr", "WN18RR"),
        "num_ent": 40943, "num_rels": 11,
        "splits": {"train": 86835, "valid": 3034, "test": 3134},
    },
}


def _validate_known(kg: KGDataset, spec: dict, where: str) -> KGDataset:
    got = {
        "num_ent": kg.num_ent, "num_rels": kg.num_rels,
        "train": len(kg.train), "valid": len(kg.valid), "test": len(kg.test),
    }
    want = {
        "num_ent": spec["num_ent"], "num_rels": spec["num_rels"],
        **spec["splits"],
    }
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    if bad:
        raise ValueError(
            f"mounted dataset at {where!r} does not match the published "
            f"{kg.name} statistics (got, want): {bad}. Check the mount "
            "against DATA.md (wrong variant, truncated files, or a "
            "filtered re-release)."
        )
    return kg


def load_dataset(name_or_path: str, data_root: str = "data") -> KGDataset:
    """Resolve a dataset by name (under data_root) or explicit path.

    Known benchmark names (fb15k-237, wn18rr — case-insensitive) are
    located under ``data_root`` in the dgl.contrib on-disk layout
    (entities.dict / relations.dict / {train,valid,test}.txt, see
    DATA.md) and validated against their published statistics; explicit
    paths load as-is.
    """
    if name_or_path == "synthetic":
        return synthetic_kg()
    if name_or_path == "synthetic-fb":
        # FB15k-237-SHAPED synthetic: the real dataset's entity/relation/
        # split cardinalities (KNOWN_DATASETS) with synthetic structure —
        # the driver-reachable workload for perf studies at headline
        # scale in the zero-egress environment (e.g. the bf16 vs f32
        # alpha-trajectory study, NOTES round-3)
        return synthetic_kg(
            num_ent=14541, num_rels=237, n_train=272115,
            n_valid=17535, n_test=20466, seed=0,
        )
    if name_or_path == "synthetic-wn":
        # WN18RR-SHAPED synthetic: the published cardinalities
        # (KNOWN_DATASETS) — the opposite skew to FB15k-237: 11 relations
        # but a 40.9k-entity table, the config where the 1-vs-N decoder /
        # entity-table costs dominate and the TP-analog column sharding
        # earns its keep (reference workload: train/mr_lp_train.py:35-73,
        # the WN18RR path)
        return synthetic_kg(
            num_ent=40943, num_rels=11, n_train=86835,
            n_valid=3034, n_test=3134, seed=0,
        )
    if name_or_path == "minikg":
        return minikg()
    if name_or_path == "minikg-small":
        return minikg(num_ent=400, n_hubs=16, n_hub_rels=4)
    key = name_or_path.lower()
    if key in KNOWN_DATASETS:
        spec = KNOWN_DATASETS[key]
        for d in spec["dirnames"]:
            cand = os.path.join(data_root, d)
            if os.path.isdir(cand):
                return _validate_known(
                    load_kg_dir(cand, name=name_or_path), spec, cand
                )
        raise FileNotFoundError(
            f"dataset {name_or_path!r} not mounted: looked for "
            f"{[os.path.join(data_root, d) for d in spec['dirnames']]}. "
            "See DATA.md for the mount contract."
        )
    if os.path.isdir(name_or_path):
        return load_kg_dir(name_or_path)
    cand = os.path.join(data_root, name_or_path)
    if os.path.isdir(cand):
        return load_kg_dir(cand, name=name_or_path)
    raise FileNotFoundError(
        f"dataset {name_or_path!r} not found (looked in {cand!r}); "
        "provide a directory with train.txt/valid.txt/test.txt"
    )
