"""`lora_ppim` — dataset preprocessing CLI
(reference preprocess_files.py:244-330)."""

from __future__ import annotations

from ._fire import fire
from ..data.preprocess import load_and_save_masks_and_captions


def main():
    fire(load_and_save_masks_and_captions)


if __name__ == "__main__":
    main()
