"""LFW fixed-pairs protocol: parsing, path resolution, fold math, app e2e.

The protocol under test is the one behind the reference's published LFW
0.99650 headline (/root/reference/README.md:55; BASELINE.json configs[2]).
The fold math is checked against a deliberately naive loop oracle.
"""

import numpy as np
import pytest
import yaml

from pathlib import Path

from facenet_tpu import lfw


# ---------------------------------------------------------------------------
# pairs.txt parsing + path resolution
# ---------------------------------------------------------------------------

PAIRS_TEXT = """\
2 2
Alice_A\t1\t2
Bob_B\t1\t3
Alice_A\t1\tBob_B\t2
Carol_C\t1\tAlice_A\t1
Bob_B\t2\t3
Carol_C\t1\t2
Bob_B\t1\tCarol_C\t2
Alice_A\t2\tGhost_X\t1
"""


@pytest.fixture(scope='module')
def lfw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('lfw')
    counts = {'Alice_A': 2, 'Bob_B': 3, 'Carol_C': 2}
    rng = np.random.RandomState(0)
    from PIL import Image
    for name, n in counts.items():
        d = root / name
        d.mkdir()
        for i in range(1, n + 1):
            img = rng.randint(0, 255, (160, 160, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f'{name}_{i:04d}.png')
    (root.parent / 'pairs.txt').write_text(PAIRS_TEXT)
    return root


def test_read_pairs(lfw_tree):
    pairs = lfw.read_pairs(lfw_tree.parent / 'pairs.txt')
    assert len(pairs) == 8
    assert pairs[0] == ('Alice_A', '1', '2')
    assert pairs[2] == ('Alice_A', '1', 'Bob_B', '2')


def test_read_pairs_header_mismatch(tmp_path):
    bad = tmp_path / 'pairs.txt'
    bad.write_text('3 300\nAlice_A\t1\t2\n')
    with pytest.raises(ValueError, match='header'):
        lfw.read_pairs(bad)


def test_get_paths(lfw_tree):
    pairs = lfw.read_pairs(lfw_tree.parent / 'pairs.txt')
    paths, issame, skipped = lfw.get_paths(lfw_tree, pairs)
    # Alice_A has only images 1-2: 'Alice_A 1 3' absent from PAIRS_TEXT;
    # Ghost_X does not exist -> the final pair is skipped
    assert skipped == 1
    assert len(issame) == 7
    assert len(paths) == 14
    assert list(issame) == [True, True, False, False, True, True, False]
    assert paths[0].endswith('Alice_A/Alice_A_0001.png')
    assert paths[5].endswith('Bob_B/Bob_B_0002.png')


def test_get_paths_explicit_ext(lfw_tree):
    pairs = [('Alice_A', '1', '2')]
    _, issame, skipped = lfw.get_paths(lfw_tree, pairs, file_ext='png')
    assert skipped == 0 and list(issame) == [True]
    _, issame, skipped = lfw.get_paths(lfw_tree, pairs, file_ext='jpg')
    assert skipped == 1 and len(issame) == 0


def test_generate_pairs_roundtrip(tmp_path):
    """Generated pairs files parse back, resolve fully, and keep the
    official structure: identity-disjoint folds, same-then-diff blocks."""
    from PIL import Image
    root = tmp_path / 'faces'
    rng = np.random.RandomState(0)
    for c in range(8):
        d = root / f'id_{c:02d}'
        d.mkdir(parents=True)
        for i in range(1, 4):
            img = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f'id_{c:02d}_{i:04d}.png')

    out = tmp_path / 'pairs.txt'
    pairs = lfw.generate_pairs(root, nrof_folds=4, nrof_pairs=5, seed=1,
                               output=out)
    parsed = lfw.read_pairs(out)
    assert parsed == [tuple(str(x) for x in p) for p in pairs]
    assert len(parsed) == 4 * 2 * 5

    paths, issame, skipped = lfw.get_paths(root, parsed)
    assert skipped == 0
    # fold f occupies block [f*10, f*10+10): 5 same then 5 diff
    expected = ([True] * 5 + [False] * 5) * 4
    assert list(issame) == expected

    # identity-disjoint folds: no identity appears in two folds
    fold_names = []
    for f in range(4):
        block = parsed[f * 10:(f + 1) * 10]
        names = {p[0] for p in block} | {p[0] if len(p) == 3 else p[2]
                                         for p in block}
        fold_names.append(names)
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (fold_names[a] & fold_names[b])


def test_generate_pairs_zero_based_indices(tmp_path):
    """Datasets with 0-based image indices (e.g. the synthetic evidence
    renderer) must generate fully-resolvable pairs: indices are parsed
    from the real filenames, not assumed 1-based like LFW's."""
    root = tmp_path / 'faces'
    for c in range(8):
        d = root / f'p_{c}'
        d.mkdir(parents=True)
        for i in range(3):  # p_0_0000.png .. p_0_0002.png
            (d / f'p_{c}_{i:04d}.png').write_bytes(b'x')

    out = tmp_path / 'pairs.txt'
    lfw.generate_pairs(root, nrof_folds=4, nrof_pairs=4, seed=0, output=out)
    parsed = lfw.read_pairs(out)
    indices = [int(x) for p in parsed for x in (p[1:] if len(p) == 3
                                                else (p[1], p[3]))]
    assert min(indices) == 0 and max(indices) <= 2
    paths, issame, skipped = lfw.get_paths(root, parsed)
    assert skipped == 0 and len(issame) == 4 * 2 * 4


def test_generate_pairs_too_few_identities(tmp_path):
    root = tmp_path / 'faces'
    for c in range(3):
        (root / f'id_{c}').mkdir(parents=True)
        (root / f'id_{c}' / f'id_{c}_0001.png').write_bytes(b'x')
    with pytest.raises(ValueError, match='identities'):
        lfw.generate_pairs(root, nrof_folds=4)


# ---------------------------------------------------------------------------
# fold protocol vs a naive loop oracle
# ---------------------------------------------------------------------------

def _oracle(emb1, emb2, issame, nrof_folds, thresholds, far_target,
            far_thresholds=None):
    """Straight-line reimplementation with python loops (no vectorized
    threshold matrix, no shared helpers) to cross-check LfwValidation.

    The FAR-threshold search runs on its own (denser) grid, as the
    protocol does (`far_thresholds`; defaults to `thresholds`)."""
    if far_thresholds is None:
        far_thresholds = thresholds
    dist = np.array([float(np.sum((a - b) ** 2))
                     for a, b in zip(emb1, emb2)])
    blocks = np.array_split(np.arange(len(issame)), nrof_folds)
    acc, val, far = [], [], []
    for test_idx in blocks:
        train_idx = np.array([i for i in range(len(issame))
                              if i not in set(test_idx.tolist())])
        # best train threshold by accuracy
        best_t, best_acc = None, -1.0
        for t in thresholds:
            correct = sum((dist[i] < t) == issame[i] for i in train_idx)
            a = correct / len(train_idx)
            if a > best_acc:
                best_acc, best_t = a, t
        correct = sum((dist[i] < best_t) == issame[i] for i in test_idx)
        acc.append(correct / len(test_idx))

        neg = [i for i in train_idx if not issame[i]]
        far_curve = [(sum(dist[i] < t for i in neg) / len(neg)) if neg
                     else 0.0 for t in far_thresholds]
        if max(far_curve) >= far_target:
            t_far = float(np.interp(far_target, far_curve, far_thresholds))
        else:
            t_far = 0.0
        pos = [i for i in test_idx if issame[i]]
        neg = [i for i in test_idx if not issame[i]]
        val.append(sum(dist[i] < t_far for i in pos) / max(len(pos), 1))
        far.append(sum(dist[i] < t_far for i in neg) / max(len(neg), 1))
    return np.array(acc), np.array(val), np.array(far)


def _random_pairs(n_pairs=80, dim=16, seed=3):
    """Half-separable random pairs: same-pairs correlated, diff-pairs not."""
    rng = np.random.RandomState(seed)
    issame = np.arange(n_pairs) % 2 == 0
    e1 = rng.randn(n_pairs, dim)
    e2 = np.where(issame[:, None], e1 + rng.randn(n_pairs, dim),
                  rng.randn(n_pairs, dim) * 2)
    norm = lambda e: e / np.linalg.norm(e, axis=1, keepdims=True)
    return norm(e1), norm(e2), issame


def test_fold_protocol_matches_oracle():
    emb1, emb2, issame = _random_pairs()
    embeddings = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])

    report = lfw.LfwValidation(embeddings, issame,
                               {'nrof_folds': 4, 'far_target': 0.1})
    acc, val, far = _oracle(emb1, emb2, issame, nrof_folds=4,
                            thresholds=report.thresholds, far_target=0.1,
                            far_thresholds=report.far_thresholds)

    np.testing.assert_allclose(report.fold_accuracy, acc, atol=1e-12)
    np.testing.assert_allclose(report.fold_val, val, atol=1e-12)
    np.testing.assert_allclose(report.fold_far, far, atol=1e-12)


def test_separable_pairs_perfect_report():
    rng = np.random.RandomState(1)
    n = 60
    issame = rng.rand(n) < 0.5
    anchors = rng.randn(n, 8)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    e1 = anchors
    # same pairs at distance 0; diff pairs at 3.61 — inside the threshold
    # grid so the train FAR curve reaches 1.0 and the FAR-targeted
    # threshold lands between the clusters (at exactly 4.0 no threshold
    # would ever fire and VAL would be 0 by protocol)
    e2 = np.where(issame[:, None], anchors, -anchors * 0.9)
    embeddings = np.stack([e1, e2], axis=1).reshape(-1, 8)

    report = lfw.LfwValidation(embeddings, issame, {'nrof_folds': 5})
    assert report.accuracy == 1.0
    assert report.auc == pytest.approx(1.0)
    assert np.mean(report.fold_val) == 1.0
    text = repr(report)
    assert 'Accuracy: 1.00000+-0.00000' in text
    assert 'Area under curve' in text


def test_subtract_mean_translation_invariance_metric0():
    """Metric-0 pair distances are translation invariant, so train-mean
    subtraction must not change any reported number."""
    emb1, emb2, issame = _random_pairs(seed=7)
    embeddings = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])
    base = lfw.LfwValidation(embeddings, issame,
                             {'nrof_folds': 4, 'metric': 0})
    sub = lfw.LfwValidation(embeddings, issame,
                            {'nrof_folds': 4, 'metric': 0,
                             'subtract_mean': True})
    assert sub.subtract_mean and not base.subtract_mean
    np.testing.assert_allclose(sub.fold_accuracy, base.fold_accuracy,
                               atol=1e-12)
    np.testing.assert_allclose(sub.fold_val, base.fold_val, atol=1e-12)


def test_subtract_mean_removes_offset_metric1():
    """A constant embedding offset corrupts angular distances; per-fold
    train-mean subtraction must recover the un-offset report."""
    emb1, emb2, issame = _random_pairs(n_pairs=200, seed=11)
    clean = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])
    # a LARGE offset compresses every angular distance below the first
    # grid threshold, collapsing accuracy toward chance (a small offset
    # would leave the pair ranking monotone and accuracy intact)
    offset = clean + 1000.0

    clean_rep = lfw.LfwValidation(clean, issame,
                                  {'nrof_folds': 4, 'metric': 1})
    off_rep = lfw.LfwValidation(offset, issame,
                                {'nrof_folds': 4, 'metric': 1})
    fixed_rep = lfw.LfwValidation(offset, issame,
                                  {'nrof_folds': 4, 'metric': 1,
                                   'subtract_mean': True})
    # the offset destroys separation; subtraction restores it (the fold
    # means differ slightly from the true offset, so compare accuracies,
    # not distances)
    assert off_rep.accuracy < clean_rep.accuracy - 0.05
    assert abs(fixed_rep.accuracy - clean_rep.accuracy) < 0.06


def test_config_object_options():
    """Config attr-dict options (falsy-empty missing keys) are honored."""
    from facenet_tpu.config import Config
    emb1, emb2, issame = _random_pairs()
    embeddings = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])
    report = lfw.LfwValidation(embeddings, issame,
                               Config({'nrof_folds': 4, 'metric': 0}))
    assert report.nrof_folds == 4
    assert report.far_target == 1e-3
    d = report.dict
    assert set(d) >= {'accuracy', 'accuracy_std', 'val', 'far', 'auc',
                      'eer', 'threshold'}


def test_pair_count_mismatch_raises():
    with pytest.raises(ValueError, match='pair'):
        lfw.LfwValidation(np.zeros((5, 4)), np.zeros(2, bool))


# ---------------------------------------------------------------------------
# app e2e: LFW-style tree + pairs.txt + tiny model -> report artifacts
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_validate_on_lfw_app(tmp_path):
    from click.testing import CliRunner
    import jax
    from PIL import Image
    from facenet_tpu import export
    from facenet_tpu.apps.validate_on_lfw import main
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    tiny = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
            'block8_1': {'repeat': 1}, 'output': {'size': 32}}
    bundle = tmp_path / 'bundle'
    model = InceptionResnetV1(config=tiny)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    export.save_model(bundle, model, variables)

    root = tmp_path / 'lfw_aligned'
    rng = np.random.RandomState(0)
    names = [f'Person_{c}' for c in range(4)]
    for name in names:
        d = root / name
        d.mkdir(parents=True)
        base = rng.randint(0, 255, (160, 160, 3)).astype(np.float32)
        for i in range(1, 4):
            img = np.clip(base + rng.randn(160, 160, 3) * 6, 0,
                          255).astype(np.uint8)
            Image.fromarray(img).save(d / f'{name}_{i:04d}.png')

    lines = ['2 2']
    for fold in range(2):
        a, b = names[2 * fold], names[2 * fold + 1]
        lines += [f'{a}\t1\t2', f'{b}\t2\t3',
                  f'{a}\t1\t{b}\t1', f'{b}\t2\t{a}\t3']
    pairs_file = tmp_path / 'pairs.txt'
    pairs_file.write_text('\n'.join(lines) + '\n')

    cfg = {
        'dataset': {'path': str(root), 'pairs': str(pairs_file)},
        'model': {'path': str(bundle)},
        'batch_size': 8,
        'validate': {'nrof_folds': 2, 'far_target': 0.5, 'flip': True},
    }
    cfg_file = tmp_path / 'lfw.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    outdir = Path(str(root) + '_' + bundle.stem)
    report = outdir / 'validate_on_lfw.txt'
    assert report.exists()
    text = report.read_text()
    assert 'LfwValidation' in text
    assert 'Accuracy:' in text
    assert 'Validation rate:' in text
    assert 'pairs: 8 (4 same)' in text
    # flip concatenation doubles the embedding width (tiny model: 32 -> 64)
    assert 'embeddings: (16, 64)' in text
    assert (outdir / 'validate_on_lfw.h5').exists()
    assert (outdir / 'revision_info.txt').exists()


# ---------------------------------------------------------------------------
# ADVICE r4 regressions
# ---------------------------------------------------------------------------

def test_read_pairs_header_after_blank_lines(tmp_path):
    """A leading blank line must not hide the header (ADVICE r4)."""
    f = tmp_path / 'pairs.txt'
    f.write_text('\n\n1 1\nAlice_A\t1\t2\nAlice_A\t1\tBob_B\t2\n')
    pairs = lfw.read_pairs(f)
    assert len(pairs) == 2
    assert pairs[0] == ('Alice_A', '1', '2')


def test_rates_single_kind_fold_accuracy_unclamped():
    """A fold of only-same (or only-diff) pairs scores correct/total, not
    the clamped (tp+1)/(n+1) distortion (ADVICE r4)."""
    emb1, emb2, issame = _random_pairs(n_pairs=12)
    embeddings = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])
    report = lfw.LfwValidation(embeddings, issame, {'nrof_folds': 3})

    dist = np.array([0.5, 1.5, 2.5])
    below = dist[:, None] < report.thresholds[None, :]

    # only-same fold: accuracy at each threshold is (#below)/3
    _, _, acc = report._rates(dist, np.ones(3, bool))
    np.testing.assert_allclose(acc, below.sum(axis=0) / 3)
    # only-diff fold: accuracy is (#not-below)/3
    _, _, acc = report._rates(dist, np.zeros(3, bool))
    np.testing.assert_allclose(acc, (3 - below.sum(axis=0)) / 3)


def test_far_threshold_search_uses_dense_grid():
    emb1, emb2, issame = _random_pairs()
    embeddings = np.stack([emb1, emb2], axis=1).reshape(-1, emb1.shape[1])
    report = lfw.LfwValidation(embeddings, issame,
                               {'nrof_folds': 4, 'far_target': 0.013})
    assert len(report.far_thresholds) == lfw.LfwValidation.NROF_FAR_THRESHOLDS
    assert len(report.far_thresholds) == 10 * len(report.thresholds)
    # the picked thresholds must land off the coarse grid when the target
    # needs sub-coarse-step resolution
    acc, val, far = _oracle(emb1, emb2, issame, nrof_folds=4,
                            thresholds=report.thresholds, far_target=0.013,
                            far_thresholds=report.far_thresholds)
    np.testing.assert_allclose(report.fold_val, val, atol=1e-12)
    np.testing.assert_allclose(report.fold_far, far, atol=1e-12)


def test_generate_pairs_unique(tmp_path):
    from PIL import Image
    root = tmp_path / 'ds'
    rng = np.random.RandomState(0)
    for c in range(8):
        d = root / f'id_{c}'
        d.mkdir(parents=True)
        for i in range(1, 5):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3)).astype(
                np.uint8)).save(d / f'id_{c}_{i:04d}.png')
    pairs = lfw.generate_pairs(root, nrof_folds=2, nrof_pairs=6, seed=0)
    same = [p for p in pairs if len(p) == 3]
    diff = [p for p in pairs if len(p) == 4]
    assert len(set(same)) == len(same) == 12
    assert len(set(diff)) == len(diff) == 12


def test_generate_pairs_impossible_uniqueness_raises(tmp_path):
    from PIL import Image
    root = tmp_path / 'ds'
    rng = np.random.RandomState(0)
    # 4 identities x 2 images: each group of 2 identities supplies at most
    # 1 distinct same-pair per identity = 2 total < the 6 requested
    for c in range(4):
        d = root / f'id_{c}'
        d.mkdir(parents=True)
        for i in range(1, 3):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3)).astype(
                np.uint8)).save(d / f'id_{c}_{i:04d}.png')
    with pytest.raises(ValueError, match='distinct'):
        lfw.generate_pairs(root, nrof_folds=2, nrof_pairs=6, seed=0)


def test_validate_on_lfw_preparer_expands_user(tmp_path, monkeypatch):
    """The preparer must expanduser() dataset.path and dataset.pairs so
    the shipped '~/...' defaults resolve (ADVICE r4, medium)."""
    import yaml as _yaml
    from facenet_tpu import config as config_mod

    home = tmp_path / 'home'
    (home / 'datasets' / 'lfw_aligned').mkdir(parents=True)
    monkeypatch.setenv('HOME', str(home))

    cfg_file = tmp_path / 'lfw.yaml'
    cfg_file.write_text(_yaml.safe_dump({
        'dataset': {'path': '~/datasets/lfw_aligned',
                    'pairs': '~/datasets/pairs.txt'},
        'model': {'path': str(tmp_path / 'bundle')},
    }))
    cfg = config_mod.validate_on_lfw(cfg_file, {'config': str(cfg_file)})
    assert '~' not in str(cfg.dataset.path)
    assert str(cfg.dataset.path) == str(home / 'datasets' / 'lfw_aligned')
    assert str(cfg.dataset.pairs) == str(home / 'datasets' / 'pairs.txt')


def test_flip_concat_embeddings_get_full_roc():
    """Flip-concatenated embeddings (norm^2 = 2, metric-0 distances up to
    8) must not truncate the threshold grid: separable pairs score
    AUC ~1 / EER ~0 instead of the broken AUC ~0.5 / EER -1 a 0..4 grid
    produced (found on the round-5 protocol-scale run)."""
    rng = np.random.RandomState(4)
    n = 60
    issame = rng.rand(n) < 0.5
    anchors = rng.randn(n, 8)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    e1 = anchors
    e2 = np.where(issame[:, None], anchors, -anchors)
    # flip-concat style: two unit halves -> norm^2 == 2, diff dist up to 8
    c1 = np.concatenate([e1, e1], axis=1)
    c2 = np.concatenate([e2, e2], axis=1)
    dist_max = np.max(np.sum((c1 - c2) ** 2, axis=1))
    assert dist_max > 4.0

    embeddings = np.stack([c1, c2], axis=1).reshape(-1, 16)
    report = lfw.LfwValidation(embeddings, issame, {'nrof_folds': 5})
    assert report.thresholds[-1] >= dist_max
    assert report.accuracy == 1.0
    assert report.auc == pytest.approx(1.0, abs=1e-6)
    assert report.eer == pytest.approx(0.0, abs=1e-6)
    # unit embeddings keep the exact upstream 0..4 grid
    unit = np.stack([e1, e2], axis=1).reshape(-1, 8)
    r2 = lfw.LfwValidation(unit, issame, {'nrof_folds': 5})
    assert len(r2.thresholds) == lfw.LfwValidation.NROF_THRESHOLDS
    np.testing.assert_allclose(
        r2.thresholds, np.linspace(0, 4.0, 400), atol=1e-9)
