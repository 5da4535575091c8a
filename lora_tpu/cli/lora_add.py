"""`lora_add` — merge / collapse / export CLI (reference cli_lora_add.py).

Modes:
  lpl          LoRA + LoRA weighted sum (per-tensor a1*x1 + a2*x2);
               .pt pairs or single-file safetensors (TI embeds pass through)
  upl          base model + LoRA collapsed into a diffusers-layout dir
  upl-ckpt-v2  same + CompVis .ckpt export + A1111 textual embedding .pt
  ljl          LoRA join (rank concat + token renaming)
"""

from __future__ import annotations

import os
from typing import Literal

import numpy as np

from ..formats import pt_io
from ..formats.reader import save_file
from ..formats.safetensors_io import safe_open
from ._fire import fire


def add(
    path_1: str,
    path_2: str,
    output_path: str,
    alpha_1: float = 0.5,
    alpha_2: float = 0.5,
    mode: Literal["lpl", "upl", "upl-ckpt-v2", "ljl"] = "lpl",
    with_text_lora: bool = False,
):
    print("Lora Add, mode " + mode)
    if mode == "lpl":
        if path_1.endswith(".pt") and path_2.endswith(".pt"):
            pairs = [(path_1, path_2, "unet")]
            if with_text_lora:
                pairs.append((pt_io.text_lora_path(path_1),
                              pt_io.text_lora_path(path_2), "text_encoder"))
            for _p1, _p2, opt in pairs:
                if opt == "text_encoder" and not (
                        os.path.exists(_p1) and os.path.exists(_p2)):
                    print(f"No text encoder found in {_p1}, skipping...")
                    continue
                l1 = pt_io.load_lora_pt(_p1)
                l2 = pt_io.load_lora_pt(_p2)
                merged = [alpha_1 * a + alpha_2 * b for a, b in zip(l1, l2)]
                out = (output_path if opt == "unet"
                       else pt_io.text_lora_path(output_path))
                pt_io.save_lora_pt(
                    [(merged[2 * i], merged[2 * i + 1])
                     for i in range(len(merged) // 2)], out)
                print(f"Saving merged {opt} to {out}")

        elif path_1.endswith(".safetensors") and path_2.endswith(".safetensors"):
            s1 = safe_open(path_1)
            s2 = safe_open(path_2)
            metadata = dict(s1.metadata())
            metadata.update(dict(s2.metadata()))
            ret = {}
            for key in set(list(s1.keys()) + list(s2.keys())):
                if key.startswith("text_encoder") or key.startswith("unet"):
                    t1 = np.asarray(s1.get_tensor(key), np.float32)
                    t2 = np.asarray(s2.get_tensor(key), np.float32)
                    ret[key] = (alpha_1 * t1 + alpha_2 * t2).astype(np.float16)
                else:  # TI embeds pass through from whichever file has them
                    src = s1 if key in s1.keys() else s2
                    ret[key] = np.asarray(src.get_tensor(key))
            save_file(ret, output_path, metadata)
            s1.close()
            s2.close()
        else:
            raise ValueError("lpl needs two .pt or two .safetensors files")

    elif mode in ("upl", "upl-ckpt-v2"):
        from ..models.hf_import import save_pipeline_params
        from ..pipelines.sd import StableDiffusionPipeline

        print(f"Merging UNET/CLIP from {path_1} with LoRA from {path_2} to "
              f"{output_path}. Merging ratio : {alpha_1}.")
        pipe = StableDiffusionPipeline.from_pretrained(
            path_1, require_real_tokenizer=False)
        tok_dict = pipe.patch_pipe(path_2,
                                   patch_ti=(mode == "upl"))
        pipe.collapse_lora(alpha_1)

        if mode == "upl":
            save_pipeline_params(pipe, output_path)
        else:
            from ..formats.ckpt_export import convert_to_ckpt

            assert output_path.endswith(".ckpt"), \
                "Only .ckpt files are supported"
            name = os.path.basename(output_path)[:-5]
            print(f"You will be using {name} as the token in A1111 webui.")
            convert_to_ckpt(pipe, output_path, as_half=True)
            if tok_dict:
                import torch

                keys = sorted(tok_dict.keys())
                cat = torch.stack([
                    torch.from_numpy(np.asarray(tok_dict[k], np.float32))
                    for k in keys])
                torch.save({"string_to_token": {"*": torch.tensor(265)},
                            "string_to_param": {"*": cat}, "name": name},
                           output_path[:-5] + ".pt")
                print(f"Textual embedding saved as {output_path[:-5]}.pt")

    elif mode == "ljl":
        print("Using Join mode : alpha will not have an effect here.")
        assert path_1.endswith(".safetensors") and \
            path_2.endswith(".safetensors"), \
            "Only .safetensors files are supported"
        from ..lora_manager import lora_join

        s1, s2 = safe_open(path_1), safe_open(path_2)
        total_tensor, total_metadata, _, _ = lora_join([s1, s2])
        save_file(total_tensor, output_path, total_metadata)
        s1.close()
        s2.close()
    else:
        raise ValueError(f"Unknown mode {mode}")


def main():
    fire(add)


if __name__ == "__main__":
    main()
