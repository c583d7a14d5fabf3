"""Best-1/2/3 + top-50 mean/std per task from results.log
(reference plot_performance.py:6-35)."""
import os

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import performance

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    perf = performance.parse_results_log(
        os.path.join(cfg.output_path, "results.log"), len(cfg.test_de_type))
    for task, rows in zip(cfg.test_de_type, perf):
        if not rows:
            continue
        s = performance.best_k_summary(rows)
        print(task)
        for rank, (p, m) in enumerate(s["best"], 1):
            print("%d%s: %.2lf/%.4lf" % (rank, {1: "st", 2: "nd", 3: "rd"}[rank], p, m))
        print("avg: %.2lf/%.4lf" % s["avg"])
        print("var: %.4lf/%.7lf" % s["std"])
