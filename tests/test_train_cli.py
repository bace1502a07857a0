"""CLI-level smoke of `train.py main()` — both presets end-to-end.

Everything below the CLI (Trainer, steps, checkpointing) has unit coverage
in test_train.py; this drives the ACTUAL entrypoint the way a user does
(reference train.py `if __name__ == '__main__'` path): argv parsing ->
config overrides -> data factory -> sharded fit -> eval -> checkpoint.
The indoor preset additionally proves the Scene7 reader feeds the trainer
(the large-N kernels themselves are covered by test_indoor_path.py; here
the point shapes are shrunk so the smoke stays CPU-sized).
"""
import importlib.util
import json
import os
import pathlib

import numpy as np

# import the repo-root train.py by explicit path: the reference-parity
# suites put /root/reference at sys.path[0], where a module also named
# `train` (the reference's CLI, which imports torchvision) would shadow
# ours under plain `import train` in a full-suite run
_TRAIN_PATH = pathlib.Path(__file__).resolve().parents[1] / "train.py"
_spec = importlib.util.spec_from_file_location("ogmm_train_cli", _TRAIN_PATH)
train_cli = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(train_cli)

TINY = ['--emb_dims', '32', '--n_clusters', '8', '--km_clusters', '8',
        '--num_heads', '2', '--gnn_k', '8']


def test_cli_mnet_synthetic_smoke(tmp_path):
    ckpt = str(tmp_path / 'ckpt')
    trainer = train_cli.main(
        ['--dataset', 'synthetic', '--n_points', '64', *TINY,
         '--batch_size', '8', '--test_batch_size', '8',
         '--epochs', '1', '--steps_per_epoch', '2',
         '--model_path', ckpt])
    assert len(trainer.history) == 1
    rec = trainer.history[-1]
    assert np.isfinite(rec['train']['loss'])
    assert np.isfinite(rec['val']['loss'])            # final epoch evals
    # checkpoint config written beside the orbax dirs, model section intact
    cfg_path = os.path.join(ckpt, 'checkpoints', 'GMMReg', 'models',
                            'config.json')
    with open(cfg_path) as f:
        saved = json.load(f)
    assert saved['model']['emb_dims'] == 32
    assert saved['data']['n_points'] == 64


def _write_ply(path, verts):
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex %d\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"end_header\n" % len(verts))
    path.write_bytes(header + verts.astype('<f4').tobytes())


def test_cli_indoor_scene7_smoke(tmp_path):
    # Scene7 layout (reference datasets/realdata.py:38-61): train = six
    # scenes, test = office. 8 fragments each so one 8-batch fills the
    # 8-device dp mesh.
    rs = np.random.RandomState(0)
    for scene in ("7-scenes-office", "7-scenes-chess", "7-scenes-fire",
                  "7-scenes-heads", "7-scenes-pumpkin",
                  "7-scenes-redkitchen", "7-scenes-stairs"):
        d = tmp_path / "data" / "7scene" / scene
        d.mkdir(parents=True)
        for i in range(8):
            pts = rs.randn(700, 3).astype(np.float32)
            _write_ply(d / f"cloud_{i}.ply", pts)

    ckpt = str(tmp_path / 'ckpt')
    trainer = train_cli.main(
        ['--preset', 'indoor', '--root', str(tmp_path / 'data'),
         '--n_points', '512', *TINY,
         '--batch_size', '8', '--test_batch_size', '8',
         '--epochs', '1', '--steps_per_epoch', '1',
         '--model_path', ckpt])
    rec = trainer.history[-1]
    assert np.isfinite(rec['train']['loss'])
    assert np.isfinite(rec['val']['loss'])
    # indoor semantics reached the config (7scene dataset, K=16 overridden)
    cfg_path = os.path.join(ckpt, 'checkpoints', 'GMMReg', 'models',
                            'config.json')
    with open(cfg_path) as f:
        saved = json.load(f)
    assert saved['data']['dataset'] == '7scene'
    assert saved['train']['n_keypoints'] == 256
