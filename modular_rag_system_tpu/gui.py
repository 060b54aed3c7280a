"""Tkinter GUI — parity with the reference ``RAGQueryInterface``

(``rag_query_interface.py:574-891``): three tabs (query with a
query-type selector + insight / retrieved-context / follow-up panes;
history; analytics), with query processing on a worker thread marshaled
back to the GUI via ``root.after``.

Gated: importing this module is safe everywhere; ``launch_gui`` raises a
clear error when tkinter or a display is unavailable (headless
containers), matching the reference's graceful-degradation pattern.
"""

from __future__ import annotations

import threading
import time
from typing import Optional


def tkinter_available() -> bool:
    try:
        import tkinter  # noqa: F401
    except Exception:
        return False
    import os

    return bool(os.environ.get("DISPLAY") or os.name == "nt")


class RAGQueryGUI:
    def __init__(self, system) -> None:
        """``system`` is an ``EnhancedRAGSystem`` facade."""
        import tkinter as tk
        from tkinter import ttk

        self.system = system
        self.root = tk.Tk()
        self.root.title("modular_rag_system_tpu")
        self.root.geometry("900x640")
        nb = ttk.Notebook(self.root)
        nb.pack(fill="both", expand=True)

        # --- query tab -------------------------------------------------
        qf = ttk.Frame(nb)
        nb.add(qf, text="Query")
        top = ttk.Frame(qf)
        top.pack(fill="x", padx=8, pady=6)
        self.query_var = tk.StringVar()
        entry = ttk.Entry(top, textvariable=self.query_var)
        entry.pack(side="left", fill="x", expand=True)
        entry.bind("<Return>", lambda _e: self.submit_query())
        self.qtype_var = tk.StringVar(value="auto")
        for qt in ("auto", "question", "suggestion", "completion", "analysis"):
            ttk.Radiobutton(top, text=qt, value=qt, variable=self.qtype_var).pack(
                side="left", padx=2
            )
        ttk.Button(top, text="Ask", command=self.submit_query).pack(side="right")
        self.insight = tk.Text(qf, height=12, wrap="word")
        self.insight.pack(fill="both", expand=True, padx=8, pady=4)
        self.context = tk.Text(qf, height=8, wrap="word")
        self.context.pack(fill="both", expand=True, padx=8, pady=4)
        self.followups = tk.Text(qf, height=3, wrap="word")
        self.followups.pack(fill="x", padx=8, pady=4)

        # --- history tab -----------------------------------------------
        hf = ttk.Frame(nb)
        nb.add(hf, text="History")
        self.history = ttk.Treeview(
            hf, columns=("time", "query", "type", "confidence"), show="headings"
        )
        for col, w in (("time", 140), ("query", 420), ("type", 100), ("confidence", 90)):
            self.history.heading(col, text=col)
            self.history.column(col, width=w)
        self.history.pack(fill="both", expand=True, padx=8, pady=6)

        # --- analytics tab ----------------------------------------------
        af = ttk.Frame(nb)
        nb.add(af, text="Analytics")
        self.analytics = tk.Text(af, wrap="word")
        self.analytics.pack(fill="both", expand=True, padx=8, pady=6)
        ttk.Button(af, text="Refresh", command=self.refresh_analytics).pack(pady=4)

    # ------------------------------------------------------------------
    def submit_query(self) -> None:
        query = self.query_var.get().strip()
        if not query:
            return
        self.insight.delete("1.0", "end")
        self.insight.insert("1.0", "processing...")

        def worker():
            try:
                resp = self.system.enhanced_query(query)
            except Exception as exc:  # surfaced, never crashes the GUI
                resp = {"insight": f"error: {exc}", "confidence": 0.0,
                        "query_type": "?", "sources": [], "follow_up_queries": []}
            self.root.after(0, lambda: self._render(query, resp))

        threading.Thread(target=worker, daemon=True).start()

    def _render(self, query: str, resp: dict) -> None:
        self.insight.delete("1.0", "end")
        self.insight.insert("1.0", resp["insight"])
        self.context.delete("1.0", "end")
        for s in resp.get("sources", []):
            self.context.insert(
                "end", f"({s['similarity']:.2f}) [{s['source']}] {s['snippet']}\n"
            )
        self.followups.delete("1.0", "end")
        self.followups.insert("1.0", " | ".join(resp.get("follow_up_queries", [])))
        self.history.insert(
            "",
            0,
            values=(
                time.strftime("%H:%M:%S"),
                query,
                resp.get("query_type", "?"),
                resp.get("confidence", 0.0),
            ),
        )

    def refresh_analytics(self) -> None:
        import json

        stats = self.system.get_system_stats()
        self.analytics.delete("1.0", "end")
        self.analytics.insert("1.0", json.dumps(stats, indent=2, default=str))

    def run(self) -> None:
        self.refresh_analytics()
        self.root.mainloop()


def launch_gui(system) -> None:
    if not tkinter_available():
        raise RuntimeError(
            "tkinter or a display is unavailable; use the CLI "
            "(python -m modular_rag_system_tpu.launcher --cli) instead"
        )
    RAGQueryGUI(system).run()
