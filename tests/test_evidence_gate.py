"""Regression gate on the committed hard-mode evidence artifact.

The reference proves its metric stack with a committed run report whose
accuracy is NOT at ceiling (reference models/20200820-121641/logs/
report.txt: 0.98482 +- 0.00226) — a benchmark at AUC 1.0000 cannot
detect a quality regression.  The rebuild's hard-mode evidence chain
(tools/e2e_evidence_run.py --hard, utils/synthetic.py hard=True:
family-archetype identities with small per-identity deltas) lands in the
same regime.  This gate parses the newest committed hard run under
models/ and fails if a future evidence commit regresses by a point,
saturates back to 1.0, or loses its error bars.
"""

import re
from pathlib import Path

import pytest

MODELS = Path(__file__).resolve().parent.parent / 'models'

# Measured on the committed run 20260817-125512: 0.98278 +- 0.00124.
# Floor catches a 1-point regression (0.973 < 0.975); ceiling rejects a
# saturated benchmark (the round-2 failure mode: AUC 1.0000, std 0.0).
ACC_FLOOR = 0.975
ACC_CEIL = 0.9995


def _hard_runs():
    runs = []
    for rev in sorted(MODELS.glob('*/logs/revision_info.txt')):
        # scoped-experiment runs (the frozen-BN A/B pair) validate on a
        # small 80x25 eval set, not the evidence geometry this gate's
        # floor is pinned to — they have their own A/B gate below
        if '-frozenbn' in rev.parent.parent.name:
            continue
        if '--hard' in rev.read_text():
            runs.append(rev.parent / 'report.txt')
    return runs


def _max_accuracy_block(text):
    """The final MaximumAccuracy block of a report (latest validation)."""
    blocks = text.split('MaximumAccuracy')
    if len(blocks) < 2:
        raise AssertionError('no MaximumAccuracy block in report')
    return blocks[-1].split('FalseAlarmRate')[0]


def _metric(block, name):
    m = re.search(rf'{name}:\s+([0-9.]+)\+-([0-9.]+)', block)
    assert m, f'{name} line missing from report block'
    return float(m.group(1)), float(m.group(2))


def test_hard_evidence_run_committed():
    assert _hard_runs(), (
        'no hard-mode evidence run committed under models/ — '
        'run tools/e2e_evidence_run.py --hard')


@pytest.mark.parametrize('report', _hard_runs() or [None])
def test_hard_evidence_not_saturated_and_no_regression(report):
    if report is None:
        pytest.skip('no hard run committed (covered by the test above)')
    text = report.read_text()
    block = _max_accuracy_block(text)

    acc, acc_std = _metric(block, 'Accuracy')
    assert acc >= ACC_FLOOR, (
        f'{report}: accuracy {acc} regressed below {ACC_FLOOR} '
        f'(committed baseline 0.98278)')
    assert acc <= ACC_CEIL, (
        f'{report}: accuracy {acc} is saturated — the benchmark can no '
        f'longer detect a regression; harden utils/synthetic.py')
    assert acc_std > 0, f'{report}: zero accuracy error bars'

    m = re.findall(r'Area under curve \(AUC\): ([0-9.]+)', text)
    assert m and float(m[-1]) < 1.0, 'AUC saturated at 1.0'

    # Sensitivity error bars prove the folds actually disagree (a
    # degenerate split yields identical folds and 0.00000 everywhere).
    _, sens_std = _metric(block, r'Sensitivity \(TPR, 1-a type 1 error\)')
    assert sens_std > 0, f'{report}: zero sensitivity error bars'


# ---- LFW fixed-pairs protocol at FULL SCALE (VERDICT r4 next #4) ----
# The committed run 20260820-214606-lfwprotocol validates the app at the
# real protocol geometry: 5,749 identities / 13,233 images, official
# pairs.txt of 10 x (300+300), flip + subtract_mean, on-chip embed +
# report in 205 s. Measured: 0.98567 +- 0.00507, VAL 0.88667 @ FAR 1e-3,
# AUC 0.99904, EER 0.01322 — same non-saturated regime as the class-
# protocol evidence, so the same gate logic applies.

def _lfw_protocol_runs():
    return sorted(MODELS.glob('*-lfwprotocol/logs/validate_on_lfw.txt'))


def test_lfw_protocol_run_committed():
    assert _lfw_protocol_runs(), (
        'no protocol-scale LFW run committed under models/ — '
        'run tools/lfw_protocol_run.py')


@pytest.mark.parametrize('report', _lfw_protocol_runs() or [None])
def test_lfw_protocol_geometry_and_quality(report):
    if report is None:
        pytest.skip('no lfwprotocol run committed (covered above)')
    text = report.read_text()

    m = re.search(r'pairs: (\d+) \((\d+) same\), folds: (\d+)', text)
    assert m, 'pairs/folds line missing'
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == \
        (6000, 3000, 10), 'not the official 10x(300+300) geometry'
    assert re.search(r'pairs: 6000 \(3000 same\), skipped: 0', text), \
        'protocol pairs must all resolve (skipped: 0)'

    acc, acc_std = _metric(text, 'Accuracy')
    assert ACC_FLOOR <= acc <= ACC_CEIL and acc_std > 0, (acc, acc_std)

    val, val_std = _metric(text, 'Validation rate')
    assert 0 < val < 1 and val_std > 0, (val, val_std)
    assert 'FAR=0.00100' in text, 'VAL@FAR target line missing'

    m = re.search(r'Area under curve \(AUC\): ([0-9.]+)', text)
    assert m and 0.95 < float(m.group(1)) < 1.0, 'AUC missing/saturated'
    m = re.search(r'Equal error rate \(EER\): ([0-9.]+)', text)
    assert m and 0 < float(m.group(1)) < 0.05, 'EER missing/degenerate'

    scale = report.parent / 'protocol_scale.txt'
    assert scale.exists(), 'protocol_scale.txt provenance missing'
    stext = scale.read_text()
    assert 'identities: 5749' in stext and 'images: 13233' in stext, \
        'run was not at LFW scale'


# ---- frozen-BN late-phase schedule A/B (VERDICT r4 next #5) ----
# Seed-matched pair on the same rendered data: control
# models/20260820-212226-frozenbn-control (no freeze) vs
# models/20260820-234522-frozenbn (freeze_bn_epoch=5 of 10). The arms'
# epoch-5 validation reports are identical (proving epochs 0-4 matched);
# the gate holds the frozen arm's final accuracy at the control's level,
# i.e. the 1.10x step speedup (tools/profile_train.py) stays
# quality-free. Measured: control 0.96650+-0.00754, frozen
# 0.96696+-0.00633.

def test_frozen_bn_ab_quality_neutral():
    control = MODELS / '20260820-212226-frozenbn-control/logs/report.txt'
    frozen = MODELS / '20260820-234522-frozenbn/logs/report.txt'
    if not (control.exists() and frozen.exists()):
        pytest.skip('frozen-BN A/B pair not committed')

    def final_acc(path):
        return _metric(_max_accuracy_block(path.read_text()), 'Accuracy')

    def epoch5_acc(path):
        text = path.read_text()
        first = text.split('MaximumAccuracy')[1].split('FalseAlarmRate')[0]
        m = re.search(r'Accuracy:\s+([0-9.]+)\+-([0-9.]+)', first)
        return float(m.group(1)), float(m.group(2))

    # pre-freeze epochs identical across arms
    assert epoch5_acc(control) == epoch5_acc(frozen), \
        'A/B arms diverge BEFORE the freeze epoch — not seed-matched'

    c_acc, c_std = final_acc(control)
    f_acc, f_std = final_acc(frozen)
    # quality-neutral: frozen within one control-std below the control
    assert f_acc >= c_acc - c_std, (
        f'frozen-BN arm regressed: {f_acc} vs control {c_acc}+-{c_std}')
