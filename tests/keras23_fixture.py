"""Byte-faithful replica of the TF-1.15 / Keras-2.3 HDF5 weight
layout, for interop testing against files this repo's own writer did
NOT produce (VERDICT round-1 item 4).

Replicates ``keras/engine/saving.py::save_weights_to_hdf5_group``
exactly as TF 1.15's bundled Keras 2.3 writes it:

* root (or ``model_weights/``) attrs ``layer_names`` as a FIXED-length
  numpy bytes array (``np.asarray([name.encode('utf8'), ...])``, not
  h5py vlen), plus ``backend=b'tensorflow'``, ``keras_version``;
* one group per model layer IN MODEL ORDER — including weightless
  layers (inputs, concat, dropout, lambda outputs), each with a
  ``weight_names`` attr (possibly empty);
* datasets at TF variable paths ``<layer>/<weight>:0`` (nested
  subgroups inside the layer group);
* attribute lists >64KB chunked into ``layer_names0``, ``layer_names1``
  (reproducible on demand via ``chunk_attrs``);
* CuDNNLSTM variant: layers auto-named ``cu_dnnlstm_<i>`` and a
  DOUBLED bias of shape (8W,) (input-side and recurrent-side halves).
"""
import numpy as np

import h5py


def _set_list_attr(group, name, values, chunk_attrs=False):
    data = np.asarray([v.encode('utf8') for v in values]) \
        if values else np.asarray([], dtype='S1')
    if chunk_attrs and len(values) > 1:
        # mimic save_attributes_to_hdf5_group's >64KB chunking
        mid = len(values) // 2 or 1
        group.attrs[name + '0'] = data[:mid]
        group.attrs[name + '1'] = data[mid:]
    else:
        group.attrs[name] = data


def write_keras23_weights(path, params, contexts=1, cudnn=False,
                          nest_model_weights=False, chunk_attrs=False,
                          uniquify_suffix=False):
    """Write ``params`` (this repo's pytree) the way TF-1.15 Keras 2.3
    ``save_weights`` would for the reference model graph
    (/root/reference/ocrd_keraslm/lib/rating.py:100-179)."""
    depth = len(params['lstm'])
    rnn = 'cu_dnnlstm' if cudnn else 'lstm'
    sfx = '_1' if uniquify_suffix else ''

    # model layer order as Keras tracks it (inputs first, then the
    # functional graph in construction order)
    layers = [('char_input', [])]
    for i in range(contexts):
        layers.append(('context%d_input' % (i + 1), []))
    layers.append(('char_embedding' + sfx,
                   [('char_embedding%s/embeddings:0' % sfx,
                     np.asarray(params['char_embedding']))]))
    for i in range(contexts):
        layers.append(('context%d_embedding%s' % (i + 1, sfx),
                       [('context%d_embedding%s/embeddings:0'
                         % (i + 1, sfx),
                         np.asarray(params['context_embeddings'][i]))]))
    layers.append(('concat_hidden_input', []))
    for i in range(depth):
        lp = params['lstm'][i]
        lname = '%s_%d%s' % (rnn, i + 1, sfx)
        bias = np.asarray(lp['bias'])
        if cudnn:
            # CuDNN keeps separate input/recurrent biases; Keras sums
            # them on conversion, so an arbitrary split round-trips
            rng = np.random.default_rng(i)
            b_in = rng.normal(size=bias.shape).astype(np.float32)
            bias = np.concatenate([b_in, bias - b_in])
        layers.append((lname, [
            ('%s/kernel:0' % lname, np.asarray(lp['kernel'])),
            ('%s/recurrent_kernel:0' % lname,
             np.asarray(lp['recurrent'])),
            ('%s/bias:0' % lname, bias),
        ]))
        if i + 1 < depth:
            layers.append(('dropout_%d' % (i + 1), []))
    layers.append(('char_output', []))

    with h5py.File(path, 'w') as f:
        root = (f.create_group('model_weights') if nest_model_weights
                else f)
        _set_list_attr(root, 'layer_names',
                       [name for name, _ in layers],
                       chunk_attrs=chunk_attrs)
        root.attrs['backend'] = b'tensorflow'
        root.attrs['keras_version'] = b'2.3.1'
        for name, weights in layers:
            g = root.create_group(name)
            _set_list_attr(g, 'weight_names', [w for w, _ in weights])
            for wname, value in weights:
                dset = g.create_dataset(wname, value.shape,
                                        dtype=value.dtype)
                if value.shape:
                    dset[:] = value
                else:
                    dset[()] = value
