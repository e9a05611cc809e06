"""G2 goalkeeper review — the legacy in-CV VLM check.

Behavior parity with the reference's VLMReviewModule
(utils/vlm_review.py): montage evidence (2x2 grids with label overlay,
:47-108), zh diagnosis prompt with the "诊断,置信度,覆盖状态" one-line
contract (:174-232), JSON-or-text parsing with the valid-class filter
(:260-330), and the agreement / needs-review aggregation (:332-399).
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from emr2a_tpu.judge.audit import create_montage
from emr2a_tpu.judge.backends import VLMBackend, load_backend
from emr2a_tpu.judge.parsers import extract_json_payload
from emr2a_tpu.judge.prompts import G2_REVIEW_PROMPT, G2_REVIEW_SYSTEM_MESSAGE

logger = logging.getLogger(__name__)

VALID_CLASSES = ["PJP", "Bacterial", "Viral", "Normal"]


class VLMReviewModule:

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 max_retries: int = 3,
                 backend: Optional[VLMBackend] = None):
        self.model_path = model_path
        self.device = device
        self.max_retries = max_retries
        self.backend = backend if backend is not None \
            else load_backend(model_path, device)

    create_montage = staticmethod(create_montage)

    def construct_evidence_package(self, query_patient: Dict,
                                   top_neighbors: List[Tuple[str, str, float]],
                                   manifest: List[Dict], output_dir: Path,
                                   base_dir: Optional[Path] = None) -> Dict:
        query_id = query_patient.get("patient_id")
        query_meta = query_patient.get("meta", {})
        query_slices = query_patient.get("slices", [])

        output_dir = Path(output_dir)
        query_montage_path = output_dir / f"query_{query_id}_montage.png"
        create_montage(query_slices[:4], query_montage_path, (2, 2),
                       "Query Patient", base_dir)

        pid_to_record = {r.get("patient_id"): r for r in manifest}
        neighbor_montages = []
        for nid, nlabel, sim in top_neighbors[:5]:
            record = pid_to_record.get(nid)
            if not record:
                continue
            montage_path = output_dir / f"neighbor_{nid}_montage.png"
            create_montage(record.get("slices", [])[:4], montage_path, (2, 2),
                           f"Similar Case (sim: {sim:.3f})", base_dir)
            neighbor_montages.append({
                "id": nid, "label": nlabel, "similarity": sim,
                "montage_path": str(montage_path),
            })

        parts = ["Query Patient Information:"]
        if query_meta.get("sex"):
            parts.append(f"- Sex: {query_meta['sex']}")
        if query_meta.get("age"):
            parts.append(f"- Age: {query_meta['age']}")
        if query_meta.get("fever"):
            parts.append(f"- Fever: {query_meta['fever']}")
        if query_meta.get("symptom"):
            parts.append(f"- Symptoms: {query_meta['symptom']}")
        parts.append("\nTop 5 Similar Cases (for reference):")
        for i, n in enumerate(neighbor_montages, 1):
            parts.append(f"{i}. Label: {n.get('label', 'Unknown')}, "
                         f"Similarity: {n['similarity']:.3f}")

        return {
            "query_id": query_id,
            "query_montage_path": str(query_montage_path),
            "query_text": "\n".join(parts),
            "query_meta": query_meta,
            "neighbors": neighbor_montages,
        }

    def query_vlm(self, evidence_package: Dict,
                  prompt_template: Optional[str] = None) -> Optional[Dict]:
        if self.backend is None:
            logger.warning("VLM backend not loaded, returning None")
            return None
        if prompt_template is None:
            prompt_template = G2_REVIEW_PROMPT
        try:
            prompt = prompt_template.format(
                query_text=evidence_package["query_text"])
            montage_path = evidence_package["query_montage_path"]
            if not Path(montage_path).exists():
                logger.error("Montage image not found: %s", montage_path)
                return None
            image = Image.open(montage_path).convert("RGB")
            output_text = self.backend.generate(
                [image], prompt, system=G2_REVIEW_SYSTEM_MESSAGE,
                max_new_tokens=512, temperature=0.0)
            return self._parse_vlm_output(output_text)
        except Exception as e:
            logger.error("Failed to query VLM: %s", e)
            return None

    def _parse_vlm_output(self, output_text: str) -> Optional[Dict]:
        """JSON {diagnosis, confidence, coverage} → 'Diagnosis:' regex →
        one-line 'PJP,0.85,covered' format; valid-class filtered
        (utils/vlm_review.py:260-330 + the one-line output contract)."""
        try:
            text = output_text.strip()

            payload = extract_json_payload(text)
            if payload and "diagnosis" in payload:
                diagnosis = str(payload.get("diagnosis", "")).strip()
                confidence = payload.get("confidence", 0.5)
                coverage = payload.get("coverage", "unknown")
                result = self._normalize(diagnosis, confidence, coverage,
                                         "JSON")
                if result is not None:
                    return result
                # invalid class in the JSON: fall through to the text
                # formats (the reference parser does the same,
                # utils/vlm_review.py:287-297)

            m_diag = re.search(r"Diagnosis:\s*(\w+)", text, re.IGNORECASE)
            if m_diag:
                m_conf = re.search(r"Confidence:\s*([0-9.]+)", text, re.IGNORECASE)
                m_cov = re.search(r"Coverage:\s*(\w+)", text, re.IGNORECASE)
                result = self._normalize(
                    m_diag.group(1).strip(),
                    float(m_conf.group(1)) if m_conf else 0.5,
                    m_cov.group(1).strip() if m_cov else "unknown",
                    "text format")
                if result is not None:
                    return result
                # invalid class in the Diagnosis: line — fall through
                # to the one-line contract, like the JSON branch above

            # One-line contract: "PJP,0.85,covered"
            m_line = re.match(
                r"\s*([A-Za-z]+)\s*[,，]\s*([0-9.]+)\s*(?:[,，]\s*(\w+))?", text)
            if m_line:
                return self._normalize(
                    m_line.group(1).strip(), float(m_line.group(2)),
                    m_line.group(3) or "unknown", "one-line format")

            logger.warning("Failed to extract prediction from VLM output: %s...",
                           output_text[:500])
            return None
        except Exception as e:
            logger.error("Error parsing VLM output: %s", e)
            return None

    def _normalize(self, diagnosis: str, confidence, coverage,
                   source: str) -> Optional[Dict]:
        if diagnosis.lower() == "uncertain":
            return {"pred": "uncertain", "confidence": 0.0,
                    "rationale": ["VLM marked as uncertain"]}
        if diagnosis not in VALID_CLASSES:
            return None
        try:
            confidence = float(confidence)
        except (TypeError, ValueError):
            confidence = 0.5
        if confidence > 1.0:
            confidence = confidence / 100.0
        return {"pred": diagnosis, "confidence": confidence,
                "rationale": [f"Extracted from {source}, Coverage={coverage}"]}

    def g2_goalkeeper_review(self, retrieval_predictions: List[str],
                             retrieval_similarities: List[List[float]],
                             retrieval_labels: List[List[str]],
                             query_patients: List[Dict],
                             top_neighbors_list: List[List[Tuple[str, str, float]]],
                             manifest: List[Dict], output_dir: Path,
                             prompt_template: Optional[str] = None,
                             base_dir: Optional[Path] = None) -> Dict:
        logger.info("Starting G2 goalkeeper review")
        vlm_predictions, vlm_confidences = [], []
        agreements, needs_review_flags, final_predictions = [], [], []

        for idx, (query_patient, top_neighbors, pred_vote) in enumerate(zip(
                query_patients, top_neighbors_list, retrieval_predictions)):
            evidence_dir = Path(output_dir) / f"evidence_{idx}"
            evidence = self.construct_evidence_package(
                query_patient, top_neighbors, manifest, evidence_dir, base_dir)
            vlm_result = self.query_vlm(evidence, prompt_template)

            if vlm_result:
                vlm_predictions.append(vlm_result["pred"])
                vlm_confidences.append(vlm_result["confidence"])
                agree = int(vlm_result["pred"] == pred_vote)
                agreements.append(agree)
                needs_review_flags.append(1 - agree)
            else:
                vlm_predictions.append(None)
                vlm_confidences.append(0.0)
                agreements.append(0)
                needs_review_flags.append(1)
            # Final prediction stays the retrieval vote; disagreement
            # only flags for review (utils/vlm_review.py:369-382).
            final_predictions.append(pred_vote)

        agreement_rate = float(np.mean(agreements)) if agreements else 0.0
        needs_review_ratio = (float(np.mean(needs_review_flags))
                              if needs_review_flags else 0.0)
        logger.info("G2 review completed: agreement_rate=%.4f, "
                    "needs_review_ratio=%.4f", agreement_rate, needs_review_ratio)
        return {
            "vlm_predictions": vlm_predictions,
            "vlm_confidences": vlm_confidences,
            "agreements": agreements,
            "needs_review_flags": needs_review_flags,
            "final_predictions": final_predictions,
            "agreement_rate": agreement_rate,
            "needs_review_ratio": needs_review_ratio,
        }
