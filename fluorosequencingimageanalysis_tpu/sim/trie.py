"""Prefix trees (tries) of signals with per-protein counts.

Parity: /root/reference/MCsimlib.py:1224-1785, 2223-2310. Nodes identify
themselves by a signal block; the root is the null block. signal_count maps
source proteins to counts at the node's signal.
"""

from __future__ import annotations


class SignalTrie:
    """Trie over ((gap, amino_acid), ...) signals
    (MCsimlib.py:1224-1759)."""

    NULL_BLOCK = (None, None)

    def __init__(self, signal_block):
        self.signal_block = tuple(signal_block)
        self.descendants = {}
        self.signal_count = {}

    def _is_root(self):
        return self.signal_block == self.NULL_BLOCK

    def add_descendant(self, subsignal, source_protein):
        subsignal = tuple(tuple(b) for b in subsignal)
        if len(subsignal) == 0:
            return None
        elif self._is_root():
            self.descendants.setdefault(subsignal[0],
                                        SignalTrie(subsignal[0]))
            self.descendants[subsignal[0]].add_descendant(subsignal,
                                                          source_protein)
        elif len(subsignal) == 1:
            self.signal_count.setdefault(source_protein, 0)
            self.signal_count[source_protein] += 1
        else:
            self.descendants.setdefault(subsignal[1],
                                        SignalTrie(subsignal[1]))
            self.descendants[subsignal[1]].add_descendant(subsignal[1:],
                                                          source_protein)
        return self

    def set_descendant(self, subsignal, count):
        if len(subsignal) == 0:
            return None
        elif self._is_root():
            self.descendants.setdefault(subsignal[0],
                                        SignalTrie(subsignal[0]))
            self.descendants[subsignal[0]].set_descendant(subsignal, count)
        elif len(subsignal) == 1:
            self.signal_count = count.copy()
        else:
            self.descendants.setdefault(subsignal[1],
                                        SignalTrie(subsignal[1]))
            self.descendants[subsignal[1]].set_descendant(subsignal[1:],
                                                          count)
        return self

    def get_descendant(self, subsignal):
        if len(subsignal) == 0:
            return None
        elif self._is_root():
            if subsignal[0] in self.descendants:
                return self.descendants[subsignal[0]].get_descendant(subsignal)
            return None
        elif len(subsignal) == 1:
            return self
        else:
            if subsignal[1] in self.descendants:
                return self.descendants[subsignal[1]].get_descendant(
                    subsignal[1:])
            return None

    def node_iterator(self):
        """Yield (signal, signal_count, node) for EVERY node incl. self."""
        for d_trie in self.descendants.values():
            for node in d_trie.node_iterator():
                if self._is_root():
                    yield node
                else:
                    yield ((self.signal_block,) + node[0], node[1], node[2])
        yield ((self.signal_block,), self.signal_count, self)

    def leaf_iterator(self):
        """Yield (signal, signal_count, node) for nodes with counts."""
        for d_trie in self.descendants.values():
            for leaf in d_trie.leaf_iterator():
                if self._is_root():
                    yield leaf
                else:
                    yield ((self.signal_block,) + leaf[0], leaf[1], leaf[2])
        if len(self.signal_count) > 0:
            yield ((self.signal_block,), self.signal_count, self)

    def pop_node(self, prefix_signal=()):
        d_gap, d_trie = next(iter(self.descendants.items()))
        if len(d_trie.descendants) == 0:
            del self.descendants[d_gap]
            return prefix_signal + (d_gap,), d_trie
        return d_trie.pop_node(prefix_signal + (d_gap,))

    def _best_second(self):
        best = (None, 0)
        second = (None, 0)
        for protein, count in self.signal_count.items():
            if count > best[1]:
                best = (protein, count)
            elif count > second[1]:
                second = (protein, count)
        return best, second

    def find_uniques(self, worst_ratio, absolute_min, maximum_secondary=None):
        """Signals dominated by one protein (MCsimlib.py:1398-1486)."""
        uniques = {}
        if len(self.signal_count) > 0:
            best, second = self._best_second()
            if ((best[1] >= absolute_min) and
                ((worst_ratio is None and second[0] is None) or
                 (worst_ratio is not None and second[1] == 0) or
                 (worst_ratio is not None and second[1] > 0 and
                  float(best[1]) / second[1] >= worst_ratio)) and
                (maximum_secondary is None or second[0] is None or
                 second[1] <= maximum_secondary)):
                uniques.setdefault((self.signal_block,), [best, [second], 0])
                for protein, count in self.signal_count.items():
                    if count == second[1] and protein != second[0]:
                        uniques[(self.signal_block,)][1].append(
                            (protein, count))
                    elif count < second[1]:
                        uniques[(self.signal_block,)][2] += count
        for block, descendant in self.descendants.items():
            d_u = descendant.find_uniques(worst_ratio, absolute_min,
                                          maximum_secondary)
            for signal, entry in d_u.items():
                if not self._is_root():
                    uniques.setdefault((self.signal_block,) + signal, entry)
                else:
                    uniques.setdefault(signal, entry)
        return uniques

    def find_uniques_absolute(self, minimum_best, maximum_secondary):
        """Absolute-count unique criterion (MCsimlib.py:1487-1532)."""
        uniques = {}
        if len(self.signal_count) > 0:
            best, second = self._best_second()
            if best[1] >= minimum_best and second[1] <= maximum_secondary:
                uniques.setdefault((self.signal_block,), [best, [second], 0])
                for protein, count in self.signal_count.items():
                    if count == second[1] and protein != second[0]:
                        uniques[(self.signal_block,)][1].append(
                            (protein, count))
                    elif count < second[1]:
                        uniques[(self.signal_block,)][2] += count
        for block, descendant in self.descendants.items():
            d_u = descendant.find_uniques_absolute(minimum_best,
                                                   maximum_secondary)
            for signal, entry in d_u.items():
                if not self._is_root():
                    uniques.setdefault((self.signal_block,) + signal, entry)
                else:
                    uniques.setdefault(signal, entry)
        return uniques

    def count_nodes(self):
        empty, used = 0, 0
        for leaf in self.node_iterator():
            if len(leaf[1]) == 0:
                empty += 1
            else:
                used += 1
        return empty, used

    def prune(self, signal):
        """Remove a signal, returning (signal, its counts)
        (MCsimlib.py:1560-1629)."""
        assert len(signal) > 0
        if len(signal) == 1:
            assert self._is_root()
        elif self._is_root():
            assert signal[0] in self.descendants
        else:
            assert signal[0] == self.signal_block
            assert signal[1] in self.descendants
        if len(signal) == 1:
            if len(self.descendants[signal[0]].descendants) == 0:
                return (signal, self.descendants.pop(signal[0]).signal_count)
            s_c = self.descendants[signal[0]].signal_count
            self.descendants[signal[0]].signal_count = {}
            return (signal, s_c)
        elif self._is_root():
            return self.descendants[signal[0]].prune(signal)
        else:
            if len(signal) == 2:
                if len(self.descendants[signal[1]].descendants) == 0:
                    return (signal,
                            self.descendants.pop(signal[1]).signal_count)
                s_c = self.descendants[signal[1]].signal_count
                self.descendants[signal[1]].signal_count = {}
                return (signal, s_c)
            r = self.descendants[signal[1]].prune(signal[1:])
            return ((self.signal_block,) + r[0], r[1])

    def graft(self, signal, signal_count):
        """Add a signal with given counts (MCsimlib.py:1630-1673)."""
        assert len(signal) > 0
        assert signal[0] == self.signal_block or self._is_root()
        assert len(signal_count) > 0
        if self._is_root():
            self.descendants.setdefault(signal[0], SignalTrie(signal[0]))
            self.descendants[signal[0]].graft(signal, signal_count)
        elif len(signal) == 1:
            for protein in signal_count:
                self.signal_count.setdefault(protein, 0)
                self.signal_count[protein] += signal_count[protein]
        else:
            self.descendants.setdefault(signal[1], SignalTrie(signal[1]))
            self.descendants[signal[1]].graft(signal[1:], signal_count)
        return self

    def merge(self, trie, cycles=None):
        assert self._is_root(), "merge can only be called on the root node"
        for leaf in trie.leaf_iterator():
            if cycles is None or leaf[0][-1][0] <= cycles:
                self.graft(leaf[0], leaf[1])
        return self

    def truncating_projection(self, cycles):
        """Project signals onto a truncated cycle count
        (MCsimlib.py:1697-1759)."""
        for leaf in list(self.leaf_iterator()):
            if leaf[0][-1][0] > cycles:
                projected = tuple(s_b for s_b in leaf[0] if s_b[0] <= cycles)
                if projected:
                    self.graft(projected, leaf[1])
        terminal_node_pointers = [
            (node[2], descendant)
            for node in self.node_iterator()
            for descendant in node[2].descendants
            if node[0][-1][0] is not None and node[0][-1][0] <= cycles and
            descendant[0] > cycles]
        for terminal_node, descendant_pointer in terminal_node_pointers:
            if descendant_pointer in terminal_node.descendants:
                del terminal_node.descendants[descendant_pointer]
        terminal_leaf_pointers = []
        for leaf in self.leaf_iterator():
            for descendant, d_pointer in leaf[2].descendants.items():
                if not any(True for _ in d_pointer.leaf_iterator()):
                    terminal_leaf_pointers.append((leaf[2], descendant))
        for descendant, d_pointer in self.descendants.items():
            if not any(True for _ in d_pointer.leaf_iterator()):
                terminal_leaf_pointers.append((self, descendant))
        for leaf_pointer, descendant in terminal_leaf_pointers:
            if descendant in leaf_pointer.descendants:
                del leaf_pointer.descendants[descendant]
        return self


class SlimSignalTrie:
    """Signal -> protein-set trie (MCsimlib.py:1761-1785)."""

    def __init__(self):
        self.descendants = {}
        self.proteins = set()

    def add_proteins(self, subsignal, proteins):
        self.descendants.setdefault(subsignal[0], SlimSignalTrie())
        if len(subsignal) > 1:
            self.descendants[subsignal[0]].add_proteins(subsignal[1:],
                                                        proteins)
        else:
            self.descendants[subsignal[0]].proteins |= proteins

    def get_proteins(self, subsignal):
        if len(subsignal) == 1:
            if subsignal[0] in self.descendants:
                return self.descendants[subsignal[0]].proteins
            return set()
        elif subsignal[0] in self.descendants:
            return self.descendants[subsignal[0]].get_proteins(subsignal[1:])
        return set()

    def compact_proteins(self, threshold=1):
        self.proteins = len(self.proteins) > threshold
        for n in self.descendants.values():
            n.compact_proteins()


class PolyfluorSignalTrie:
    """Trie over error-annotated PolyfluorSignals (MCsimlib.py:2223-2310)."""

    NULL_BLOCK = (None, None, None)

    def __init__(self, signal_block):
        self.signal_block = tuple(signal_block)
        self.descendants = {}
        self.signal_count = {}

    def _is_root(self):
        return self.signal_block == self.NULL_BLOCK

    def add_descendant(self, subsignal, source_protein):
        if len(subsignal) == 0:
            return None
        elif self._is_root():
            self.descendants.setdefault(subsignal[0],
                                        PolyfluorSignalTrie(subsignal[0]))
            self.descendants[subsignal[0]].add_descendant(subsignal,
                                                          source_protein)
        elif len(subsignal) == 1:
            self.signal_count.setdefault(source_protein, 0)
            self.signal_count[source_protein] += 1
        else:
            self.descendants.setdefault(subsignal[1],
                                        PolyfluorSignalTrie(subsignal[1]))
            self.descendants[subsignal[1]].add_descendant(subsignal[1:],
                                                          source_protein)
        return self

    def get_descendant(self, subsignal):
        if len(subsignal) == 0:
            return None
        elif self._is_root():
            if subsignal[0] in self.descendants:
                return self.descendants[subsignal[0]].get_descendant(subsignal)
            return None
        elif len(subsignal) == 1:
            return self
        else:
            if subsignal[1] in self.descendants:
                return self.descendants[subsignal[1]].get_descendant(
                    subsignal[1:])
            return None

    def isoerr_get_descendant(self, subsignal):
        """Unfinished stub in the reference (MCsimlib.py:2274-2277): strips
        error annotations then falls through returning None — kept as-is."""
        if len(subsignal) == 0:
            return
        subsignal = [s[:2] for s in subsignal]

    def graft(self, signal, signal_count):
        if self._is_root():
            self.descendants.setdefault(signal[0],
                                        PolyfluorSignalTrie(signal[0]))
            self.descendants[signal[0]].graft(signal, signal_count)
        elif len(signal) == 1:
            for protein in signal_count:
                self.signal_count.setdefault(protein, 0)
                self.signal_count[protein] += signal_count[protein]
        else:
            self.descendants.setdefault(signal[1],
                                        PolyfluorSignalTrie(signal[1]))
            self.descendants[signal[1]].graft(signal[1:], signal_count)
        return self

    def leaf_iterator(self):
        for d_trie in self.descendants.values():
            for leaf in d_trie.leaf_iterator():
                if self._is_root():
                    yield leaf
                else:
                    yield ((self.signal_block,) + leaf[0], leaf[1], leaf[2])
        if len(self.signal_count) > 0:
            yield ((self.signal_block,), self.signal_count, self)

    def merge(self, trie):
        if not self._is_root():
            raise Exception("merge can only be called on root node.")
        for leaf in trie.leaf_iterator():
            self.graft(leaf[0], leaf[1])
        return self
