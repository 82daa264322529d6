"""Command-line driver (reference dashboard.py: prepare | train | eval | all).

Verbs:
  synth    — generate a synthetic dataset in the reference on-disk format
  prepare  — feature generation (+ optional walk/random positives)
  train    — train PinSage, export the embedding matrix
  eval     — run the baseline comparison, write results CSVs
  all      — prepare + train + eval (reference dashboard.py:175-192)
  stats    — dataset statistics (reference print_dataset_stats)
  grid     — hyperparameter grid search (reference grid_search.py)
  serve    — HTTP serving layer (delegates to serve.py: embedding /
             hybrid / sharded indexes, online add/remove)

Usage:
  python -m gcn_song_embeddings_tpu.cli <verb> --dataset DIR [options]
"""

from __future__ import annotations

import argparse
import json
import os
import sys



def _load_graph(args, need_features: bool = True):
    from gcn_song_embeddings_tpu.data import SongGraph

    features_file = None
    features_dir = None
    if need_features:
        cand = os.path.join(args.dataset, f"features_{args.features}.npy")
        if os.path.isfile(cand):
            features_file = cand
        elif os.path.isfile(os.path.join(args.dataset, "features.npy")):
            features_file = os.path.join(args.dataset, "features.npy")
        else:
            features_dir = os.path.join(args.dataset,
                                        f"features_{args.features}")
    return SongGraph(args.dataset, features_dir=features_dir,
                     features_file=features_file)


def _positives_path(args) -> str:
    if args.positives:
        # an explicit request must not silently fall back (a typo'd
        # filename would otherwise evaluate against the wrong pairs)
        p = os.path.join(args.dataset, args.positives)
        if not os.path.isfile(p):
            raise FileNotFoundError(f"--positives {args.positives!r} not "
                                    f"found in {args.dataset}")
        return p
    for name in ("positives_lfm.json", "positives.json"):
        p = os.path.join(args.dataset, name)
        if os.path.isfile(p):
            return p
    raise FileNotFoundError(f"no positives file found in {args.dataset}")


def _run_config(args):
    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )

    cfg = RunConfig(run_name=args.run_name)
    if args.config:
        if not os.path.isfile(args.config):
            raise FileNotFoundError(f"--config {args.config!r} not found")
        with open(args.config) as f:
            cfg = RunConfig.from_json(f.read())
        cfg = cfg.replace(run_name=args.run_name)
    overrides = {}
    for kv in args.set or []:
        key, _, value = kv.partition("=")
        overrides[key] = json.loads(value)
    return config_with_overrides(cfg, overrides)


def cmd_synth(args) -> None:
    from gcn_song_embeddings_tpu.data import (
        make_hard_dataset,
        make_synthetic_dataset,
    )

    if args.hard:
        make_hard_dataset(args.dataset, n_tracks=args.n_tracks,
                          n_collections=args.n_collections,
                          n_positives=args.n_positives,
                          feature_dim=args.feature_dim, seed=args.seed)
        print(f"hard (graph>features) dataset written to {args.dataset}")
        return
    make_synthetic_dataset(args.dataset, n_tracks=args.n_tracks,
                           n_collections=args.n_collections,
                           n_positives=args.n_positives,
                           feature_dim=args.feature_dim, seed=args.seed)
    print(f"synthetic dataset written to {args.dataset}")


def cmd_prepare(args) -> None:
    """Feature generation + positives (reference prepare_dataset,
    dashboard.py:18-45)."""
    from gcn_song_embeddings_tpu import features as F

    weights = getattr(args, "feature_weights", None)
    if args.features == "random":
        emb = F.RandomFeatures(dim=512, seed=args.seed)
    elif args.features == "mfcc":
        emb = F.MFCC()
    elif args.features == "openl3":
        emb = F.OpenL3(weights_path=weights, seed=args.seed)
    elif args.features in ("vggish", "vggish2"):
        # "vggish2" kept as an alias; note the native model is AudioSet
        # VGGish and writes features_vggish/ (see features.VGGish docstring)
        emb = F.VGGish(weights_path=weights, seed=args.seed)
    elif args.features == "musicnn":
        emb = F.MusicNN(weights_path=weights, seed=args.seed)
    else:
        raise SystemExit(f"unknown feature model {args.features!r}")
    F.generate_features(args.dataset, emb)
    print(f"features_{emb.name} generated")

    if args.gen_positives:
        from gcn_song_embeddings_tpu.config import WalkConfig
        from gcn_song_embeddings_tpu.data.device import DeviceGraph
        from gcn_song_embeddings_tpu.data.positives import (
            generate_walk_positives,
            indices_to_id_pairs,
        )
        from gcn_song_embeddings_tpu.ops.ppr import precompute_neighborhoods

        graph = _load_graph(args, need_features=False)
        dg = DeviceGraph.from_graph(graph)
        nbhds = precompute_neighborhoods(
            dg, WalkConfig(), graph.nbhds_path, seed=args.seed, verbose=True)
        pairs = generate_walk_positives(nbhds, graph.n_items, seed=args.seed)
        pairs = indices_to_id_pairs(pairs, graph.track_ids)
        out = os.path.join(args.dataset, "positives.json")
        with open(out, "w", encoding="utf-8") as f:
            json.dump(pairs, f)
        print(f"{len(pairs)} walk positives -> {out}")


def cmd_train(args) -> None:
    """Train PinSage (reference train_pinsage, dashboard.py:48-79).

    --mesh-graph N > 0 trains on ALL visible devices with a
    (dp, N) mesh via ShardedTrainer (node tables row-sharded)."""
    import numpy as np

    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    graph = _load_graph(args)
    if graph.features is None:
        raise SystemExit("no features found; run `prepare` first")
    dg = DeviceGraph.from_graph(graph)
    train_pos, _ = graph.load_positives_split(_positives_path(args))
    cfg = _run_config(args)

    if getattr(args, "mesh_graph", 0):
        from gcn_song_embeddings_tpu.ops.ppr import precompute_neighborhoods
        from gcn_song_embeddings_tpu.parallel.mesh import make_mesh
        from gcn_song_embeddings_tpu.parallel.train_step import (
            ShardedTrainer,
        )

        from gcn_song_embeddings_tpu.data.device import (
            apply_colisten_config,
        )

        dg, nbhds_path = apply_colisten_config(dg, train_pos, cfg.walk,
                                               graph.nbhds_path)
        nbhds = precompute_neighborhoods(dg, cfg.walk, nbhds_path,
                                         seed=cfg.train.seed, verbose=True)
        mesh = make_mesh(n_graph=args.mesh_graph)
        trainer = ShardedTrainer(mesh, cfg, graph.n_items, graph.features,
                                 nbhds, train_pos)
        run_dir = os.path.join(args.run_dir, cfg.run_name)
        os.makedirs(run_dir, exist_ok=True)
        state_path = os.path.join(run_dir, "state.npz")
        if not args.no_resume:
            trainer.load(state_path)
        trainer.train_epochs(verbose=True, save_path=state_path)
        trainer.save(state_path)
        path = os.path.join(run_dir, "emb.npy")
        np.save(path, trainer.embed())
        print(f"[sharded mesh {dict(mesh.shape)}] embeddings -> {path}")
        return

    trainer = PinSageTrainer(dg, graph.n_items, graph.features, train_pos,
                             cfg=cfg, base_run_dir=args.run_dir,
                             nbhds_path=graph.nbhds_path,
                             log=True, load_save=not args.no_resume)
    trainer.train()
    path = trainer.save_embeddings()
    print(f"embeddings -> {path}")


def cmd_eval(args) -> None:
    """Baseline comparison (reference eval_baselines, dashboard.py:82-172)."""
    from gcn_song_embeddings_tpu.evals.harness import get_knn_dict
    from gcn_song_embeddings_tpu.evals.tables import (
        compute_beyond_accuracy_table,
        compute_results_table,
    )
    from gcn_song_embeddings_tpu.models.baselines import (
        ColTrackCF,
        EmbLoader,
        FastNode2Vec,
        GraphSAGE,
        JaccardFast,
        PersPageRank,
        Random,
        TrackTrackCF,
    )

    graph = _load_graph(args)
    train_pos, test_pos = graph.load_positives_split(_positives_path(args))

    models = {
        "Random": Random(),
        "PageRank": PersPageRank(),
        # framework extension: walk ranking over the colisten-augmented
        # graph — the most precise ranker on the hard benchmark
        # (RESULTS.md round-4 walk-vs-conv control)
        "PageRankCo": PersPageRank(colisten_copies=1),
        "JaccardFast": JaccardFast(),
        "Node2Vec": FastNode2Vec(),
        "TrackTrackCfALS": TrackTrackCF(algo="als"),
        "TrackTrackCfBPR": TrackTrackCF(algo="bpr"),
        "ColTrackCfALS": ColTrackCF(algo="als"),
        "ColTrackCfLMF": ColTrackCF(algo="lmf"),
        "GraphSAGE": GraphSAGE(),
        "GAT": GraphSAGE(layer="gat"),
        "GCN": GraphSAGE(layer="gcn"),
    }
    if graph.features is not None:
        # mirror _load_graph's resolution order so the Features baseline
        # scores the same matrix every other component consumed
        for cand in (os.path.join(graph.base_dir,
                                  f"features_{args.features}.npy"),
                     os.path.join(graph.base_dir, "features.npy"),
                     os.path.join(graph.base_dir,
                                  f"features_{args.features}")):
            if os.path.exists(cand):
                models["Features"] = EmbLoader(cand)
                break
    for run_name in args.pinsage_runs or []:
        emb_path = os.path.join(args.run_dir, run_name, "emb.npy")
        models[f"PinSage:{run_name}"] = EmbLoader(emb_path)
    for run_name in getattr(args, "hybrid_runs", None) or []:
        # walk-precision + embedding-recall hybrid over that run's
        # embeddings (models/baselines/simple.WalkEmbedHybrid)
        from gcn_song_embeddings_tpu.models.baselines import (
            WalkEmbedHybrid,
        )

        emb_path = os.path.join(args.run_dir, run_name, "emb.npy")
        models[f"Hybrid:{run_name}"] = WalkEmbedHybrid(emb_path)

    if args.models:
        unknown = set(args.models) - set(models)
        if unknown:
            raise SystemExit(f"unknown models {sorted(unknown)}; "
                             f"available: {sorted(models)}")
        models = {k: v for k, v in models.items() if k in args.models}

    save_dir = args.eval_dir or os.path.join(args.dataset, "baselines")
    knn_dict = get_knn_dict(models, graph, graph.track_ids, train_pos,
                            test_pos, graph.features, save_dir, k=args.k)
    table = compute_results_table(knn_dict, test_pos, graph.in_degrees())
    print(table.round(5).to_string())
    table.to_csv(os.path.join(save_dir, "results_accuracy.csv"))
    if graph.features is not None:
        beyond = compute_beyond_accuracy_table(
            knn_dict, test_pos, graph.in_degrees(), graph.features)
        print(beyond.round(5).to_string())
        beyond.to_csv(os.path.join(save_dir, "results_beyond.csv"))
    print(f"results -> {save_dir}")


def cmd_stats(args) -> None:
    graph = _load_graph(args, need_features=False)
    positives = None
    try:
        positives = graph.load_positives(_positives_path(args))
    except FileNotFoundError:
        pass
    print(json.dumps(graph.stats(positives), indent=2))


def cmd_grid(args) -> None:
    from gcn_song_embeddings_tpu.train.grid_search import grid_search

    graph = _load_graph(args)
    if graph.features is None:
        raise SystemExit("no features found: pass --features-file / "
                         "--features-dir or synth a dataset with features")
    train_pos, test_pos = graph.load_positives_split(_positives_path(args))
    with open(args.grid) as f:
        grid = json.load(f)
    results = grid_search(graph, train_pos, test_pos, grid,
                          base_cfg=_run_config(args),
                          base_run_dir=args.run_dir, out_path=args.out)
    print(json.dumps(results[:5], indent=2))


def cmd_all(args) -> None:
    cmd_prepare(args)
    cmd_train(args)
    args.pinsage_runs = (args.pinsage_runs or []) + [args.run_name]
    cmd_eval(args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="gcn_song_embeddings_tpu")
    sub = p.add_subparsers(dest="verb", required=True)

    def common(sp):
        sp.add_argument("--dataset", required=True)
        sp.add_argument("--features", default="random",
                        help="feature model name "
                             "(random|mfcc|openl3|vggish|musicnn)")
        sp.add_argument("--positives", default=None,
                        help="positives filename inside the dataset dir")
        sp.add_argument("--run-name", default="pinsage_tpu")
        sp.add_argument("--run-dir", default="./runs")
        sp.add_argument("--config", default=None,
                        help="RunConfig json file")
        sp.add_argument("--set", action="append", metavar="KEY=JSON",
                        help="config override, e.g. --set train.lr=0.001")
        sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser("synth")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--n-tracks", type=int, default=5000)
    sp.add_argument("--n-collections", type=int, default=1000)
    sp.add_argument("--n-positives", type=int, default=20000)
    sp.add_argument("--feature-dim", type=int, default=128)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--hard", action="store_true",
                    help="hierarchical benchmark dataset where the graph "
                         "signal must beat the feature signal "
                         "(data/synth.make_hard_dataset)")
    sp.set_defaults(func=cmd_synth)

    for verb, fn in (("prepare", cmd_prepare), ("train", cmd_train),
                     ("eval", cmd_eval), ("stats", cmd_stats),
                     ("all", cmd_all), ("grid", cmd_grid)):
        sp = sub.add_parser(verb)
        common(sp)
        if verb in ("prepare", "all"):
            sp.add_argument("--gen-positives", action="store_true")
            sp.add_argument("--feature-weights", default=None,
                            help="npz weights for openl3/vggish/musicnn "
                                 "(models/audio_embedders.py); default "
                                 "random-init (untrained)")
        if verb in ("train", "all"):
            sp.add_argument("--no-resume", action="store_true")
            sp.add_argument("--mesh-graph", type=int, default=0,
                            help="train sharded on all devices with this "
                                 "graph-axis size (0 = single device)")
        if verb in ("eval", "all"):
            sp.add_argument("--eval-dir", default=None)
            sp.add_argument("--k", type=int, default=1000)
            sp.add_argument("--pinsage-runs", nargs="*", default=None)
            sp.add_argument("--hybrid-runs", nargs="*", default=None,
                            help="add Hybrid:<run> rows: walk-precision "
                                 "+ embedding-recall over that run's "
                                 "emb.npy (WalkEmbedHybrid)")
            sp.add_argument("--models", nargs="*", default=None,
                            help="subset of baseline names to evaluate")
        if verb == "grid":
            sp.add_argument("--grid", required=True,
                            help="json file: {param_path: [values, ...]}")
            sp.add_argument("--out", default="grid_search.json")
        sp.set_defaults(func=fn)

    sp = sub.add_parser(
        "serve", add_help=False,
        help="start the HTTP serving layer (delegates to "
             "gcn_song_embeddings_tpu.serve — see its --help)")
    sp.set_defaults(func=None)

    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "serve":
        # delegate verbatim: serve owns its own argparse surface
        from gcn_song_embeddings_tpu import serve as serve_mod

        sys.argv = [f"{p.prog} serve"] + list(argv[1:])
        serve_mod.main()
        return

    args = p.parse_args(argv)
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    args.func(args)


if __name__ == "__main__":
    main()
