"""VLM audit module — the step4 quality-control gatekeeper.

Behavior parity with the reference VLMAuditModule
(pipelines/step4_vlm_review/vlm_audit_module.py): evidence packaging
(4 even-spaced query slices + 2 per neighbor × 5 neighbors + meta
text, :157-247), VLM query with query images + first image of top-3
neighbors (:249-364), the parse waterfall (judge/parsers.py), threshold
gating accept/reject ≥ thresholds else abstain (:736-761), batch
aggregation (:651-734) and NEEDS_REVIEW routing (:763-822).

The generation engine is a pluggable backend (judge/backends.py);
failures degrade to {abstain, 0.0, "VLM query failed"} so the batch
never crashes — the reference's safety semantics.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from emr2a_tpu.judge.backends import VLMBackend, load_backend
from emr2a_tpu.judge.parsers import parse_audit_output

logger = logging.getLogger(__name__)


def select_even_slices(slice_paths: Sequence[str], num_slices: int = 4
                       ) -> List[str]:
    """Evenly spaced slice subset, order-preserving and de-duplicated.

    Capability parity with the reference's even-spacing selection
    (vlm_audit_module.py:157-172): ``num_slices`` indices spread over
    [0, n-1] inclusive of both ends.
    """
    n = len(slice_paths)
    if n == 0 or num_slices <= 0:
        return []
    if n <= num_slices:
        return list(slice_paths)
    step = (n - 1) / max(num_slices - 1, 1)  # num_slices==1 -> first slice
    picks = (slice_paths[int(i * step)] for i in range(num_slices))
    return list(dict.fromkeys(picks))


def create_montage(slice_paths: Sequence[str],
                   output_path: Optional[Path] = None,
                   grid_size: Tuple[int, int] = (2, 2),
                   label: Optional[str] = None,
                   base_dir: Optional[Path] = None) -> Optional[Image.Image]:
    """Tile slices into a cols x rows evidence grid, optionally labeled.

    Same artifact role as the reference's montage builder
    (vlm_audit_module.py:93-155); assembled as one numpy block instead
    of sequential pastes, and mismatched slice sizes are resized to the
    first slice's size (the reference pastes them unresized, silently
    corrupting the grid — deliberate fix, vlm_audit_module.py:130-137).
    """
    tiles: List[np.ndarray] = []
    for p in slice_paths:
        full = _resolve(str(p), base_dir)
        try:
            with Image.open(full) as img:
                tiles.append(np.asarray(img.convert("RGB")))
        except OSError as e:
            logger.warning("Skipping unreadable slice %s: %s", full, e)
    if not tiles:
        return None
    try:
        cols, rows = grid_size
        h, w = tiles[0].shape[:2]
        cells = [t if t.shape[:2] == (h, w)
                 else np.asarray(Image.fromarray(t).resize((w, h)))
                 for t in tiles[:cols * rows]]
        blank = np.full((h, w, 3), 255, np.uint8)
        cells += [blank] * (cols * rows - len(cells))
        grid = np.asarray(cells).reshape(rows, cols, h, w, 3)
        montage = Image.fromarray(
            grid.transpose(0, 2, 1, 3, 4).reshape(rows * h, cols * w, 3))

        if label:
            # margin scales with the grid so the tag stays legible on
            # any slice resolution
            margin = max(8, h // 48)
            ImageDraw.Draw(montage).text(
                (margin, margin), label, fill=(255, 0, 0),
                font=_montage_font(max(16, h // 24)))

        if output_path:
            output_path = Path(output_path)
            output_path.parent.mkdir(parents=True, exist_ok=True)
            montage.save(output_path)
        return montage
    except Exception as e:
        logger.error("Failed to create montage: %s", e)
        return None


def _montage_font(size: int):
    try:
        return ImageFont.load_default(size=size)
    except Exception:
        return ImageFont.load_default()


def _resolve(path: str, base_dir: Optional[Path]) -> Path:
    p = Path(path)
    if not p.is_absolute() and base_dir:
        p = base_dir / path
    return p


def render_query_text(meta: Dict) -> str:
    parts = ["Query Patient Information:"]
    if meta.get("sex"):
        parts.append(f"- Sex: {meta['sex']}")
    if meta.get("age"):
        parts.append(f"- Age: {meta['age']}")
    if meta.get("fever"):
        parts.append(f"- Fever: {meta['fever']}")
    if meta.get("symptom"):
        parts.append(f"- Symptoms: {meta['symptom']}")
    return "\n".join(parts)


class VLMAuditModule:

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 max_retries: int = 3, accept_threshold: float = 0.7,
                 reject_threshold: float = 0.7,
                 abstain_threshold: float = 0.5,
                 backend: Optional[VLMBackend] = None,
                 precision: str = "bf16", kv_dtype: str = "bf16",
                 draft_model_path: Optional[str] = None,
                 prefill_chunk: Optional[int] = None, tp: int = 1):
        self.model_path = model_path
        self.device = device
        self.max_retries = max_retries
        self.accept_threshold = accept_threshold
        self.reject_threshold = reject_threshold
        self.abstain_threshold = abstain_threshold
        self.backend = backend if backend is not None \
            else load_backend(model_path, device, precision=precision,
                              kv_dtype=kv_dtype,
                              draft_model_path=draft_model_path,
                              prefill_chunk=prefill_chunk, tp=tp)

    # -- evidence --

    def construct_evidence_package(self, query_patient: Dict,
                                   top_neighbors: List[Tuple[str, str, float]],
                                   manifest: List[Dict], output_dir: Path,
                                   base_dir: Optional[Path] = None) -> Dict:
        query_meta = query_patient.get("meta", {})
        query_images = [
            str(p) for p in
            (_resolve(s, base_dir)
             for s in select_even_slices(query_patient.get("slices", []), 4))
            if p.exists()]

        pid_to_record = {r.get("patient_id"): r for r in manifest}
        neighbor_data = []
        for rank, (nid, nlabel, sim) in enumerate(top_neighbors[:5], 1):
            record = pid_to_record.get(nid)
            if not record:
                continue
            images = [
                str(p) for p in
                (_resolve(s, base_dir)
                 for s in select_even_slices(record.get("slices", []), 2))
                if p.exists()]
            neighbor_data.append({
                "rank": rank,
                "id": nid,
                "label": nlabel,
                "similarity": sim,
                "images": images,
                "meta": record.get("meta", {}),
            })

        return {
            "query_id": query_patient.get("patient_id"),
            "query_images": query_images,
            "query_text": render_query_text(query_meta),
            "query_meta": query_meta,
            "neighbors": neighbor_data,
        }

    # -- querying --

    def _build_audit_request(self, evidence_package: Dict,
                             predicted_label: str,
                             prompt_template: Optional[str] = None
                             ) -> Optional[Dict]:
        """Assemble the generation request for one audit case: query
        images + first image of the top-3 neighbors + formatted prompt
        (vlm_audit_module.py:249-330).  Returns ``{images, prompt,
        system, cited_neighbors}`` or None if no usable images exist.

        The template's constant instruction block rides as the SYSTEM
        message (judge/prompts.split_audit_prompt): in token order it
        precedes the per-case images, so a batch of audit cases shares
        it as a literal token prefix and continuous serving prefills it
        once per wave instead of once per case."""
        if prompt_template is None:
            from emr2a_tpu.judge.prompts import get_vlm_audit_prompt
            prompt_template = get_vlm_audit_prompt()
        from emr2a_tpu.judge.prompts import split_audit_prompt
        system, prompt_template = split_audit_prompt(prompt_template)

        query_images = evidence_package.get("query_images", [])
        if not query_images:
            logger.error("No query images found")
            return None

        images = [Image.open(p).convert("RGB") for p in query_images
                  if Path(p).exists()]

        neighbors = evidence_package.get("neighbors", [])
        cited_neighbors = []
        for neighbor in neighbors[:3]:
            imgs = neighbor.get("images", [])
            if imgs and Path(imgs[0]).exists():
                images.append(Image.open(imgs[0]).convert("RGB"))
                cited_neighbors.append(neighbor["rank"])

        if not images:
            logger.error("No valid images found")
            return None

        neighbor_text = "\n".join(
            f"  [{n['rank']}] ID: {n['id']}, Label: {n['label']}, "
            f"Similarity: {n['similarity']:.3f}"
            for n in neighbors[:3])

        prompt = prompt_template.format(
            query_text=evidence_package["query_text"],
            predicted_label=predicted_label,
            neighbor_info=neighbor_text)
        return {"images": images, "prompt": prompt,
                "system": system or None,
                "cited_neighbors": cited_neighbors}

    def query_vlm_audit(self, evidence_package: Dict, predicted_label: str,
                        prompt_template: Optional[str] = None,
                        temperature: float = 0.0,
                        max_new_tokens: int = 1024) -> Optional[Dict]:
        if self.backend is None:
            logger.warning("VLM backend not loaded")
            return None
        try:
            request = self._build_audit_request(
                evidence_package, predicted_label, prompt_template)
            if request is None:
                return None
            output_text = self.backend.generate(
                request["images"], request["prompt"],
                system=request.get("system"),
                max_new_tokens=max_new_tokens, temperature=temperature)

            result = parse_audit_output(output_text)
            if result and request["cited_neighbors"]:
                result["cited_neighbors"] = request["cited_neighbors"]
            return result
        except Exception as e:
            logger.error("Error querying VLM: %s", e, exc_info=True)
            return None

    # -- decision logic --

    def _apply_decision_thresholds(self, vlm_decision: str,
                                   vlm_confidence: float) -> str:
        """accept/reject stand only above their thresholds; everything
        else abstains (vlm_audit_module.py:736-761)."""
        if vlm_decision == "accept":
            return "accept" if vlm_confidence >= self.accept_threshold else "abstain"
        if vlm_decision == "reject":
            return "reject" if vlm_confidence >= self.reject_threshold else "abstain"
        return "abstain"

    def audit_batch(self, retrieval_predictions: List[str],
                    retrieval_similarities: List[List[float]],
                    retrieval_labels: List[List[str]],
                    query_patients: List[Dict],
                    top_neighbors_list: List[List[Tuple[str, str, float]]],
                    manifest: List[Dict], output_dir: Path,
                    base_dir: Optional[Path] = None,
                    prompt_template: Optional[str] = None,
                    vlm_batch_size: int = 1,
                    serving: str = "static",
                    max_new_tokens: int = 1024) -> Dict:
        """``vlm_batch_size > 1`` serves that many audit cases per
        prefill+decode through the backend's ``generate_batch`` (decode
        is weight-bandwidth-bound, so N cases cost ~1x decode wall time
        — docs/PERF_NOTES.md).  Default 1 keeps the reference's
        one-case-at-a-time loop (vlm_audit_module.py:651-734); failed
        items still degrade individually to abstain.

        ``serving="continuous"`` (with vlm_batch_size as the slot
        count) streams ALL cases through the backend's slot server
        (``generate_stream``) instead of fixed chunks: finished cases
        free their slot for the next queued case mid-decode, so mixed
        output lengths don't decode at the pace of the slowest row."""
        logger.info("Starting VLM audit on %d samples", len(query_patients))
        samples = list(zip(query_patients, top_neighbors_list,
                           retrieval_predictions))
        vlm_results: List[Optional[Dict]] = []
        # serving="continuous" counts as batched even at slot count 1:
        # the user explicitly asked for the slot server, which still
        # buys chunked early-exit decode — dropping the flag silently
        # would pay the exact per-case cost it was meant to remove.
        batched = ((vlm_batch_size > 1 or serving == "continuous")
                   and self.backend is not None
                   and hasattr(self.backend, "generate_batch"))
        if batched:
            requests: List[Optional[Dict]] = []
            for query_patient, top_neighbors, pred_label in samples:
                try:
                    evidence = self.construct_evidence_package(
                        query_patient, top_neighbors, manifest, output_dir,
                        base_dir)
                    requests.append(self._build_audit_request(
                        evidence, pred_label, prompt_template))
                except Exception as e:
                    logger.error("Evidence build failed: %s", e)
                    requests.append(None)
            vlm_results = [None] * len(samples)
            live = [i for i, r in enumerate(requests) if r is not None]
            streaming = (serving == "continuous"
                         and hasattr(self.backend, "generate_stream"))
            if streaming:
                logger.info("Streaming %d audit cases through %d slots",
                            len(live), vlm_batch_size)
                try:
                    outputs = self.backend.generate_stream(
                        [requests[i] for i in live],
                        max_new_tokens=max_new_tokens,
                        n_slots=vlm_batch_size)
                    for i, output_text in zip(live, outputs):
                        if output_text is None:
                            continue
                        result = parse_audit_output(output_text)
                        if result and requests[i]["cited_neighbors"]:
                            result["cited_neighbors"] = \
                                requests[i]["cited_neighbors"]
                        vlm_results[i] = result
                    live = []
                except Exception as e:
                    logger.error("Continuous serving failed, falling back "
                                 "to static batches: %s", e)
            for chunk_start in range(0, len(live), vlm_batch_size):
                chunk = live[chunk_start:chunk_start + vlm_batch_size]
                logger.info("Auditing batch of %d (samples %s)", len(chunk),
                            [i + 1 for i in chunk])
                try:
                    outputs = self.backend.generate_batch(
                        [requests[i] for i in chunk],
                        max_new_tokens=max_new_tokens)
                except Exception as e:
                    logger.error("Batched VLM query failed, falling back "
                                 "to per-item: %s", e)
                    outputs = []
                    for i in chunk:
                        try:
                            outputs.append(self.backend.generate(
                                requests[i]["images"], requests[i]["prompt"],
                                system=requests[i].get("system"),
                                max_new_tokens=max_new_tokens))
                        except Exception as e2:
                            logger.error("VLM query failed: %s", e2)
                            outputs.append(None)
                for i, output_text in zip(chunk, outputs):
                    if output_text is None:
                        continue
                    result = parse_audit_output(output_text)
                    if result and requests[i]["cited_neighbors"]:
                        result["cited_neighbors"] = \
                            requests[i]["cited_neighbors"]
                    vlm_results[i] = result
        else:
            for idx, (query_patient, top_neighbors, pred_label) in enumerate(
                    samples):
                logger.info("Auditing sample %d/%d: %s", idx + 1,
                            len(samples),
                            query_patient.get("patient_id", "unknown"))
                evidence = self.construct_evidence_package(
                    query_patient, top_neighbors, manifest, output_dir,
                    base_dir)
                vlm_results.append(self.query_vlm_audit(
                    evidence, pred_label, prompt_template=prompt_template))

        audit_results = []
        for (query_patient, top_neighbors, pred_label), vlm_result in zip(
                samples, vlm_results):
            if vlm_result is None:
                vlm_result = {"decision": "abstain", "confidence": 0.0,
                              "cited_neighbors": [],
                              "rationale": "VLM query failed"}

            final_decision = self._apply_decision_thresholds(
                vlm_result["decision"], vlm_result["confidence"])
            audit_results.append({
                "patient_id": query_patient.get("patient_id"),
                "predicted_label": pred_label,
                "vlm_decision": vlm_result["decision"],
                "vlm_confidence": vlm_result["confidence"],
                "final_decision": final_decision,
                "cited_neighbors": vlm_result.get("cited_neighbors", []),
                "rationale": vlm_result.get("rationale", ""),
            })

        decisions = [r["final_decision"] for r in audit_results]
        n = len(decisions) or 1
        counts = {d: decisions.count(d) for d in ("accept", "reject", "abstain")}
        logger.info("Audit completed: accept=%d reject=%d abstain=%d",
                    counts["accept"], counts["reject"], counts["abstain"])
        return {
            "audit_results": audit_results,
            "accept_count": counts["accept"],
            "reject_count": counts["reject"],
            "abstain_count": counts["abstain"],
            "accept_ratio": counts["accept"] / n if decisions else 0.0,
            "reject_ratio": counts["reject"] / n if decisions else 0.0,
            "abstain_ratio": counts["abstain"] / n if decisions else 0.0,
        }

    def compute_final_predictions(self, retrieval_predictions: List[str],
                                  audit_results: List[Dict],
                                  ground_truth: Optional[List[str]] = None
                                  ) -> Dict:
        """accept → keep; reject/abstain → NEEDS_REVIEW; coverage +
        accuracy-on-accepted (vlm_audit_module.py:763-822)."""
        final_predictions = []
        needs_human_review = []
        for pred, audit in zip(retrieval_predictions, audit_results):
            if audit["final_decision"] == "accept":
                final_predictions.append(pred)
                needs_human_review.append(False)
            else:
                final_predictions.append("NEEDS_REVIEW")
                needs_human_review.append(True)

        # Empty batches (e.g. every sampled case missing from the
        # manifest) must degrade, not crash — skip-and-continue
        # semantics (SURVEY §5 failure detection).
        review_ratio = (sum(needs_human_review) / len(needs_human_review)
                        if needs_human_review else 0.0)
        result = {
            "final_predictions": final_predictions,
            "needs_human_review": needs_human_review,
            "coverage": 1.0 - review_ratio,
            "human_review_ratio": review_ratio,
        }
        if ground_truth:
            accepted = [i for i, needs in enumerate(needs_human_review)
                        if not needs]
            if accepted:
                correct = sum(
                    1 for i in accepted
                    if retrieval_predictions[i] == ground_truth[i])
                result["accuracy_on_accepted"] = correct / len(accepted)
                result["n_accepted"] = len(accepted)
            else:
                result["accuracy_on_accepted"] = 0.0
                result["n_accepted"] = 0
        return result
