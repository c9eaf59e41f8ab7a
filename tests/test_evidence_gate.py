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
