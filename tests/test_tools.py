"""tools_tpu driver scripts: command construction and dry-run wiring."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_configs_ae_dry_run_commands():
    out = subprocess.check_output(
        [sys.executable, "tools_tpu/run_configs_ae.py", "--dry_run"],
        cwd=REPO, text=True)
    lines = out.strip().splitlines()
    # 5 configs x 5 stages (fp32, qat, fake-quant eval, int8 eval, export)
    assert len(lines) == 25, out
    # config flags mirror the README recipes exactly
    a_train = next(l for l in lines if l.startswith("[a:fp32_train]"))
    assert "--input_res 256" in a_train and "--num_epochs 90" in a_train \
        and "--lr_step 50,70" in a_train and "--w2" not in a_train
    b_eval = next(l for l in lines if l.startswith("[b:eval_fakequant]"))
    assert "--maxpool" in b_eval and "--flip_test" in b_eval \
        and "--resume-quantize" in b_eval and "--act_clamp" in b_eval \
        and "--int8_infer" not in b_eval
    b_int8 = next(l for l in lines if l.startswith("[b:eval_int8]"))
    assert "--int8_infer" in b_int8 and "--act_clamp" in b_int8
    d_qat = next(l for l in lines if l.startswith("[d:qat_finetune]"))
    assert "--w2" in d_qat and "--num_epochs 180" in d_qat \
        and "--wt-percentile" in d_qat and "--resume" in d_qat \
        and "--act_clamp" in d_qat
    e_train = next(l for l in lines if l.startswith("[e:fp32_train]"))
    assert "--w2" in e_train and "--maxpool" in e_train \
        and "--input_res 512" in e_train
    c_exp = next(l for l in lines if l.startswith("[c:export_w4a8]"))
    assert "export_w4a8.py" in c_exp and "--resume-quantize" in c_exp


def test_run_configs_ae_subset():
    out = subprocess.check_output(
        [sys.executable, "tools_tpu/run_configs_ae.py", "--dry_run",
         "--configs", "c", "--fp32_epochs", "2", "--qat_epochs", "1"],
        cwd=REPO, text=True)
    lines = out.strip().splitlines()
    assert len(lines) == 5
    assert "--num_epochs 2" in lines[0] and "--num_epochs 1" in lines[1]


def test_demo_entry_point(tmp_path):
    """demo.py activates the --demo flag (the reference parses it,
    lib/opts.py:25, but has no consumer): images in, rendered box
    visualizations out."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic import make_voc_dataset
    make_voc_dataset(str(tmp_path), num_images=2, img_w=120, img_h=90)
    sys.path.insert(0, REPO)
    import demo
    rc = demo.main(
        ("ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
         f"--demo {tmp_path}/voc/images --exp_id demotest_ci "
         "--vis_thresh 0.0").split())
    assert rc == 0
    out_dir = os.path.join(REPO, "exp", "ctdet", "demotest_ci", "demo")
    outs = sorted(os.listdir(out_dir))
    assert outs == ["000001.png", "000002.png"]
    import shutil
    shutil.rmtree(os.path.join(REPO, "exp", "ctdet", "demotest_ci"))


def test_convert_hourglass_weight_renames():
    """The ExtremeNet->CenterNet rename rules incl. the ct_heats guard
    (reference tools/convert_hourglass_weight.py:10-26) and a torch
    round-trip through the CLI."""
    sys.path.insert(0, os.path.join(REPO, "tools_tpu"))
    from convert_hourglass_weight import convert_state_dict

    sd = {
        "module.t_heats.0.weight": 1, "module.ct_heats.0.weight": 2,
        "module.l_regrs.0.bias": 3, "module.pre.conv.weight": 4,
    }
    out = convert_state_dict(sd)
    assert out == {
        "module.hm_t.0.weight": 1, "module.hm_c.0.weight": 2,
        "module.reg_l.0.bias": 3, "module.pre.conv.weight": 4,
    }

    import tempfile
    import torch
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.pkl")
        dst = os.path.join(d, "out.pth")
        torch.save({k: torch.tensor(float(v)) for k, v in sd.items()}, src)
        rc = subprocess.call(
            [sys.executable, "tools_tpu/convert_hourglass_weight.py",
             src, dst], cwd=REPO)
        assert rc == 0
        loaded = torch.load(dst, weights_only=False)
        assert loaded["epoch"] == 0
        assert set(loaded["state_dict"]) == set(out)


def test_eval_coco_hp_scores_keypoints_and_bbox(tmp_path):
    """tools_tpu/eval_coco_hp.py (reference tools/eval_coco_hp.py): one
    command scores OKS keypoints then bbox on the same results.json;
    perfect predictions give AP 1.0 on both."""
    import json
    import numpy as np

    rng = np.random.RandomState(3)
    images, anns, results = [], [], []
    for i in range(3):
        x, y, w, h = 20, 10, 60, 70
        kps = []
        for _ in range(17):
            kps += [float(x + rng.randint(0, w)),
                    float(y + rng.randint(0, h)), 2]
        images.append({"id": i + 1, "file_name": "%d.jpg" % i,
                       "width": 128, "height": 96})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                     "num_keypoints": 17, "keypoints": kps})
        results.append({"image_id": i + 1, "category_id": 1,
                        "bbox": [x, y, w, h], "score": 0.9,
                        "keypoints": kps})
    gt_path = str(tmp_path / "person_keypoints.json")
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "person",
                               "keypoints": ["k%d" % j for j in range(17)],
                               "skeleton": []}]}, open(gt_path, "w"))
    res_path = str(tmp_path / "results.json")
    json.dump(results, open(res_path, "w"))

    sys.path.insert(0, REPO)
    from tools_tpu.eval_coco_hp import main
    stats = main([res_path, "--gt", gt_path])
    assert set(stats) == {"keypoints", "bbox"}
    for iou_type, s in stats.items():
        assert abs(float(s["AP"]) - 1.0) < 1e-6, (iou_type, s)
