"""Quality gate for int8 serving: full 10-fold validation bf16 vs int8.

Loads a TRAINED exported bundle, embeds an evaluation dataset through
the bf16 fast path and through the int8 path (models/quantize.py, via
the real `FaceNet(quantize='int8')` serving surface), and runs the
complete pair-validation report on both. The committed evidence run
(models/20260817-125512, hard-mode identities) is the intended input:
its accuracy is off-ceiling, so a quantization-induced quality drop is
actually measurable.

Usage:
  python tools/validate_int8.py RUN_DIR EVAL_DIR [--batch 256]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('run_dir', type=Path)
    ap.add_argument('eval_dir', type=Path)
    ap.add_argument('--batch', type=int, default=256)
    args = ap.parse_args()

    from facenet_tpu import FaceNet, dataset, facenet, statistics
    from facenet_tpu.config import Config

    val_cfg = Config({'metric': 0, 'nrof_folds': 10, 'far_target': 0.001})

    def evaluate(tag, model_cfg):
        net = FaceNet(Config(model_cfg))
        cfg = Config({'image': {'size': 160}, 'batch_size': args.batch,
                      'model': model_cfg})
        dbase = dataset.DBase(Config({'path': str(args.eval_dir),
                                      'max_nrof_images': 50}))
        t0 = time.time()
        ev = facenet.EvaluationOfEmbeddings(dbase, cfg,
                                            forward_fn=net.evaluate)
        print(f'{tag}: {ev.embeddings.shape} embeddings '
              f'in {time.time() - t0:.1f}s', flush=True)
        report = statistics.FaceToFaceValidation(ev.embeddings, ev.labels,
                                                 val_cfg)
        print(f'==== {tag} ====')
        print(report)
        return report

    evaluate('bf16', {'path': str(args.run_dir)})
    evaluate('int8', {'path': str(args.run_dir), 'quantize': 'int8',
                      'calib': str(args.eval_dir)})


if __name__ == '__main__':
    main()
