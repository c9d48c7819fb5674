"""PyG-style adapter (data/adapters.py) and the notebook cleaner
(utils/clean_notebook.py) — the last two reference dev utilities."""

import json
from types import SimpleNamespace

import numpy as np
import torch

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.adapters import convert_dataset, from_pyg
from feta_tmlr_tpu.utils.clean_notebook import (
    clean_notebook_main, clean_script_lines, notebook_to_lines)


def _pyg_like(n=5, with_tags=False, seed=0):
    g = torch.Generator().manual_seed(seed)
    ei = torch.tensor([[i, i + 1] for i in range(n - 1)]
                      + [[i + 1, i] for i in range(n - 1)]).T
    x = (torch.randint(0, 3, (n, 1), generator=g) if with_tags
         else torch.randn(n, 4, generator=g))
    return SimpleNamespace(x=x, edge_index=ei, y=torch.tensor([1.5]),
                           edge_attr=torch.randn(ei.shape[1], 2,
                                                 generator=g),
                           num_nodes=n)


def test_from_pyg_float_features():
    d = _pyg_like()
    graph = from_pyg(d)
    np.testing.assert_allclose(graph.x, d.x.numpy())
    np.testing.assert_array_equal(graph.edge_index, d.edge_index.numpy())
    assert graph.y == 1.5 and graph.edge_attr.shape == (8, 2)


def test_from_pyg_one_hot_tags_and_degree_stats():
    graphs, stats = convert_dataset([_pyg_like(with_tags=True, seed=i)
                                     for i in range(3)], n_tags=3)
    assert graphs[0].x.shape == (5, 3)
    assert set(np.unique(graphs[0].x)) == {0.0, 1.0}
    # chain of 5: end nodes deg 1, middle deg 2 -> max 2,
    # reference integer mean: (8 + 4) // 5 = 2
    assert stats[0] == {"max_neighbor": 2, "mean_neighbor": 2}
    # converted graphs feed the standard collate path
    batch = collate_graphs(graphs, max_nodes=8, node_labels=False)
    assert batch.x.shape == (3, 8, 3)


def test_convert_dataset_none_passthrough():
    assert convert_dataset(None) is None


_NB = {
    "cells": [
        {"cell_type": "markdown", "source": ["# title\n"]},
        {"cell_type": "code", "source": [
            "# comment to strip\n",
            "def in_ipynb():\n",
            "    try:\n",
            "        return True\n",
            "    except NameError:\n",
            "        return False\n",
            "notebook_mode = in_ipynb()\n",
            "print(notebook_mode)\n",
        ]},
        {"cell_type": "code", "source": [
            "if notebook_mode==True:\n",
            "    MODEL_NAME = 'GatedGCN'\n",
            "    use_gpu = True\n",
            "def main(notebook_mode=False,config=None):\n",
            "    if notebook_mode==False:\n",
            "        parse_args()\n",
            "    gpu_id = -1\n",
            "    device = None\n",
            "    train()\n",
            "if notebook_mode==True:\n",
            "    main(True)\n",
            "else:\n",
            "    main()\n",
        ]},
    ],
}


def test_clean_notebook_roundtrip(tmp_path):
    nb_path = tmp_path / "main_test.ipynb"
    nb_path.write_text(json.dumps(_NB))
    lines = notebook_to_lines(str(nb_path))
    assert any("def main" in ln for ln in lines)
    assert not any("# title" in ln for ln in lines)   # markdown dropped

    out = clean_notebook_main(str(nb_path))
    text = open(out).read()
    assert "# In[" not in text and "in_ipynb" not in text
    assert "notebook_mode" not in text
    assert "def main():" in text and "\nmain()" in text
    assert "MODEL_NAME" not in text and "use_gpu" not in text
    assert "gpu_id" not in text and "device = None" not in text
    # the unindented terminal-mode body survived
    assert "    parse_args()" in text and "    train()" in text
    compile(text, out, "exec")          # cleaned script parses


def test_clean_idempotent():
    lines = ["def main():\n", "    train()\n", "main()\n"]
    assert clean_script_lines(list(lines)) == lines
