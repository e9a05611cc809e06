"""Step 1 — build the patient manifest from clinical CSVs + CT folders.

Behavior parity with the reference builder
(pipelines/step1_manifest/build_manifest.py): multi-encoding CSV read
(utf-8-sig/gb18030/gbk/utf-8, :55-67), headerless fallback with the
[name, sex, age, fever, symptom] schema (:108-127), natural-sorted
slice scan (:51-52, 165-197), CSV↔folder alignment by patient_id →
exact name → normalized name → pinyin (:204-343), SHA1 pseudo-IDs
(:200-201), and the same four outputs: ``manifest.jsonl``,
``patient_mapping.csv``, ``missing_in_fs.csv``, ``missing_in_csv.csv``.

Pure host/pandas — there is nothing for the TPU here; this stage's
value is the bit-compatible manifest contract the device pipeline
consumes.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import pandas as pd

try:
    from pypinyin import lazy_pinyin as _lazy_pinyin  # type: ignore
    PINYIN_AVAILABLE = True
except Exception:
    _lazy_pinyin = None
    PINYIN_AVAILABLE = False

LABEL_DIR_MAP = {
    "Bacterial": "Bacterial",
    "Viral": "Viral",
    "PJP": "PJP",
    "Normal": "Normal",
}

META_KEY_CANON = {
    "姓名": "name", "性别": "sex", "年龄": "age",
    "发热": "fever", "发烧": "fever", "症状": "symptom",
}

CSV_LABEL_MAP = {
    "Bacterial.csv": "Bacterial",
    "Viral.csv": "Viral",
    "PJP.csv": "PJP",
    "Normal.csv": "Normal",
}

NAME_GUESS = ["name", "姓名", "患者姓名", "PatientName"]

HEADERLESS_SCHEMA = ["name", "sex", "age", "fever", "symptom"]


def natural_key(text: str) -> List[object]:
    """Numeric-aware sort key so slice_2 < slice_10."""
    return [int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", text)]


def read_csv_with_fallback(path: Path, header="infer") -> pd.DataFrame:
    last_err = None
    for enc in ("utf-8-sig", "gb18030", "gbk", "utf-8"):
        try:
            return pd.read_csv(path, encoding=enc, header=header, dtype=str,
                               keep_default_na=False)
        except UnicodeDecodeError as e:
            last_err = e
    # the reference raises a 1-arg UnicodeDecodeError here, which
    # itself crashes with TypeError (needs 5 args) — reference bug
    # (build_manifest.py:67), fixed with a plain ValueError
    raise ValueError(f"Failed to decode {path} with any known encoding") from last_err


def resolve_name_col(df: pd.DataFrame, name_col: Optional[str]) -> str:
    if name_col:
        if name_col not in df.columns:
            raise ValueError(
                f"Name column '{name_col}' not found. Columns: {list(df.columns)}")
        return name_col
    for guess in NAME_GUESS:
        if guess in df.columns:
            return guess
    raise ValueError(f"Name column not found. Columns: {list(df.columns)}")


def _read_all_csvs(csv_dir: Path, label_col: Optional[str],
                   header="infer") -> pd.DataFrame:
    frames = []
    for csv_name, label in CSV_LABEL_MAP.items():
        df = read_csv_with_fallback(csv_dir / csv_name, header=header)
        if header is None:
            if df.shape[1] == len(HEADERLESS_SCHEMA):
                df.columns = HEADERLESS_SCHEMA
            else:
                df.columns = ["name"] + [f"col_{i}" for i in range(1, df.shape[1])]
        if label_col:
            if label_col not in df.columns:
                raise ValueError(
                    f"Label column '{label_col}' not found in {csv_name}. "
                    f"Columns: {list(df.columns)}")
            df["__label__"] = df[label_col].astype(str)
        else:
            df["__label__"] = label
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def load_csvs(data_root: Path, name_col: Optional[str], id_col: str,
              label_col: Optional[str]) -> Tuple[pd.DataFrame, str, bool]:
    """Read the four class CSVs; retry headerless when no name column
    resolves (reference :81-129)."""
    csv_dir = data_root / "Case_csv"
    merged = _read_all_csvs(csv_dir, label_col)
    try:
        resolved = resolve_name_col(merged, name_col)
    except ValueError:
        merged = _read_all_csvs(csv_dir, label_col, header=None)
        resolved = "name"
        print("Headerless CSVs detected; columns set to "
              "[name/sex/age/fever/symptom].")
    return merged, resolved, id_col in merged.columns


def parse_slice_exts(raw: str) -> Optional[List[str]]:
    if raw.strip() == "":
        return None
    exts = []
    for ext in raw.split(","):
        ext = ext.strip().lower()
        if not ext:
            continue
        exts.append(ext if ext.startswith(".") else f".{ext}")
    return exts or None


def normalize_folder_key(value: str) -> str:
    value = value.strip().lower().replace("-", "_").replace(" ", "_")
    value = re.sub(r"__+", "_", value)
    return value.strip("_")


def normalize_person_name(value: str) -> str:
    # Strip whitespace + zero-width characters (ZWSP/ZWNJ/ZWJ/BOM).
    return re.sub(r"[\s\u200b\u200c\u200d\ufeff]+", "", value.strip())


def name_to_pinyin(name: str) -> Optional[str]:
    if not PINYIN_AVAILABLE or _lazy_pinyin is None:
        return None
    return normalize_folder_key("_".join(_lazy_pinyin(name)))


def sha1_id(name: str) -> str:
    return "P" + hashlib.sha1(name.encode("utf-8")).hexdigest()[:10]


def scan_images(data_root: Path, slice_exts: Optional[List[str]],
                image_subdir: str, relative_paths: bool,
                relative_base: Path) -> Dict[str, Dict[str, List[str]]]:
    """{label: {patient_folder: [natural-sorted slice paths]}}."""
    image_root = data_root / image_subdir
    index: Dict[str, Dict[str, List[str]]] = {}
    for label, dir_name in LABEL_DIR_MAP.items():
        category_dir = image_root / dir_name
        patients: Dict[str, List[str]] = {}
        if category_dir.exists():
            for patient_dir in sorted(
                    (p for p in category_dir.iterdir() if p.is_dir()),
                    key=lambda p: p.name):
                files = [f for f in patient_dir.iterdir() if f.is_file()
                         and (not slice_exts or f.suffix.lower() in slice_exts)]
                files.sort(key=lambda p: natural_key(p.name))
                if relative_paths:
                    patients[patient_dir.name] = [
                        str(f.relative_to(relative_base)) for f in files]
                else:
                    patients[patient_dir.name] = [str(f) for f in files]
        index[label] = patients
    return index


def _row_patient_id(row, id_col: str, has_id_col: bool, name: str) -> str:
    if has_id_col and pd.notna(row.get(id_col)):
        return str(row.get(id_col)).strip()
    return sha1_id(name)


def align(df: pd.DataFrame, name_col: str, id_col: str, has_id_col: bool,
          label_col: Optional[str],
          image_index: Dict[str, Dict[str, List[str]]],
          drop_name: bool, image_subdir: str
          ) -> Tuple[List[dict], Optional[pd.DataFrame], pd.DataFrame, pd.DataFrame]:
    """Match each CSV row to a patient slice folder; 4-stage matching:
    patient_id → exact name → whitespace-normalized name → pinyin."""
    manifest: List[dict] = []
    missing_in_fs = []
    matched: Dict[str, set] = {label: set() for label in LABEL_DIR_MAP}
    mapping_rows = []

    image_index = {label: {k.strip(): v for k, v in patients.items()}
                   for label, patients in image_index.items()}
    normalized_index = {label: {normalize_person_name(k): k for k in patients}
                        for label, patients in image_index.items()}

    for _, row in df.iterrows():
        name = str(row.get(name_col, "")).strip()
        if not name or name == "nan":
            continue
        label = str(row.get(label_col, row.get("__label__", ""))).strip()
        if label not in image_index:
            continue

        label_patients = image_index[label]
        label_norm = normalized_index[label]

        folder_name = None
        match_by = None
        patient_id = None

        if has_id_col and pd.notna(row.get(id_col)):
            candidate = str(row.get(id_col)).strip()
            if candidate in label_patients:
                patient_id, match_by, folder_name = candidate, "patient_id", candidate
        if folder_name is None and name in label_patients:
            patient_id = _row_patient_id(row, id_col, has_id_col, name)
            match_by, folder_name = "name", name
        if folder_name is None:
            norm = normalize_person_name(name)
            if norm in label_norm:
                patient_id = _row_patient_id(row, id_col, has_id_col, name)
                match_by, folder_name = "name", label_norm[norm]
        if folder_name is None:
            pin = name_to_pinyin(name)
            if pin and pin in label_norm:
                patient_id = _row_patient_id(row, id_col, has_id_col, name)
                match_by, folder_name = "name", label_norm[pin]

        if folder_name is None:
            patient_id = _row_patient_id(row, id_col, has_id_col, name)
            match_by = "name"
            missing_in_fs.append({
                "patient_id": patient_id, "name": name, "label": label,
                "match_by": match_by,
                "expected_dir": str(Path(image_subdir) / LABEL_DIR_MAP[label] / name),
            })
            if not has_id_col:
                mapping_rows.append({
                    "patient_id": patient_id, "name": name, "label": label,
                    "folder_name": "", "match_by": match_by,
                })
            continue

        matched[label].add(folder_name)
        meta = row.to_dict()
        for key in [name_col, id_col, "__label__"]:
            meta.pop(key, None)
        if label_col:
            meta.pop(label_col, None)
        # Canonicalize known zh clinical columns so downstream
        # consumers (clinical-text rendering, CNN clinical features)
        # find them.  The reference keeps raw headers in meta
        # (build_manifest.py:300-311) while its text renderer reads
        # english keys (run_cv_experiments.py:218-226) — zh-headered
        # CSVs silently produce zero text embeddings there; fixed here.
        meta = {META_KEY_CANON.get(k, k): v for k, v in meta.items()}

        entry = {
            "patient_id": patient_id or sha1_id(name),
            "label": label,
            "image_dir": str(Path(image_subdir) / LABEL_DIR_MAP[label] / folder_name),
            "slices": label_patients.get(folder_name, []),
            "meta": meta,
            "match_by": match_by or "name",
        }
        if not drop_name:
            entry["name"] = name
        manifest.append(entry)

        if not has_id_col:
            mapping_rows.append({
                "patient_id": entry["patient_id"], "name": name, "label": label,
                "folder_name": folder_name, "match_by": match_by or "name",
            })

    missing_in_csv = [
        {"label": label, "folder_name": folder,
         "image_dir": str(Path(image_subdir) / LABEL_DIR_MAP[label] / folder)}
        for label, patients in image_index.items()
        for folder in patients if folder not in matched[label]
    ]

    mapping_df = pd.DataFrame(mapping_rows) if mapping_rows else None
    return manifest, mapping_df, pd.DataFrame(missing_in_fs), pd.DataFrame(missing_in_csv)


def write_manifest(out_dir: Path, manifest: List[dict]) -> None:
    with (out_dir / "manifest.jsonl").open("w", encoding="utf-8") as f:
        for row in manifest:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Build manifest from CSV + CT image folders.")
    parser.add_argument("--data_root", default="data")
    parser.add_argument("--out_dir", "--output_dir", dest="out_dir",
                        default="outputs")
    parser.add_argument("--name_col", default=None)
    parser.add_argument("--id_col", default="patient_id")
    parser.add_argument("--label_col", default=None)
    parser.add_argument("--image_subdir", default="CT_2D_image_core")
    parser.add_argument("--relative_paths", default="true",
                        choices=["true", "false"])
    parser.add_argument("--slice_ext", default=".png,.jpg,.jpeg,.dcm")
    parser.add_argument("--drop_name", action="store_true")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    if not PINYIN_AVAILABLE:
        print("pypinyin not installed; name->pinyin folder matching disabled.")

    data_root = Path(args.data_root)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    df, name_col, has_id_col = load_csvs(
        data_root, args.name_col, args.id_col, args.label_col)
    image_index = scan_images(
        data_root, parse_slice_exts(args.slice_ext), args.image_subdir,
        args.relative_paths == "true", data_root.parent)
    manifest, mapping_df, missing_in_fs, missing_in_csv = align(
        df, name_col, args.id_col, has_id_col, args.label_col,
        image_index, args.drop_name, args.image_subdir)

    write_manifest(out_dir, manifest)
    if mapping_df is not None:
        mapping_df.to_csv(out_dir / "patient_mapping.csv", index=False,
                          encoding="utf-8-sig")

    print(f"Manifest rows: {len(manifest)}")
    if manifest:
        print("Per-label counts:")
        counts: Dict[str, int] = {}
        for row in manifest:
            counts[row["label"]] = counts.get(row["label"], 0) + 1
        for label in sorted(counts):
            print(f"  {label}: {counts[label]} patients")
    if not missing_in_fs.empty:
        missing_in_fs.to_csv(out_dir / "missing_in_fs.csv", index=False,
                             encoding="utf-8-sig")
    if not missing_in_csv.empty:
        missing_in_csv.to_csv(out_dir / "missing_in_csv.csv", index=False,
                              encoding="utf-8-sig")
    print(f"Alignment failures (CSV -> FS missing): {len(missing_in_fs)}")
    print(f"Alignment failures (FS -> CSV missing): {len(missing_in_csv)}")


if __name__ == "__main__":
    main()
