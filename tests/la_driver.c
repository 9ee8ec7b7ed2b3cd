/* Test driver: invoke the *reference* Local_Alignment on sequences given on
 * stdin and dump the resulting paths, so the Python oracle can be
 * differentially tested against the reference implementation.
 *
 * Compiled against the read-only reference sources (-I/root/reference); this
 * file is test infrastructure only, not part of the framework.
 *
 * stdin:  ave_corr trace_space reach freq0..3
 *         flags low hgh anti
 *         A sequence (ACGT text)
 *         B sequence (ACGT text)
 * stdout: "A abpos bbpos aepos bepos diffs tlen" then tlen trace values,
 *         "B ..." likewise.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "DB.h"
#include "align.h"

static char *read_seq(int *len)
{ static char buf[4 << 20];
  char *s;
  if (scanf("%s", buf+1) != 1) exit(1);
  *len = strlen(buf+1);
  s = malloc(*len + 2);
  memcpy(s+1, buf+1, *len);
  s[1 + *len] = '\0';
  { int i;
    for (i = 1; i <= *len; i++)
      switch (buf[i])
        { case 'A': s[i] = 0; break;
          case 'C': s[i] = 1; break;
          case 'G': s[i] = 2; break;
          default:  s[i] = 3; break;
        }
  }
  s[0] = 4;
  s[1 + *len] = 4;
  return s+1;
}

int main(void)
{ double ave_corr; int trace_space, reach;
  float freq[4];
  int flags, low, hgh, anti;
  char *aseq, *bseq;
  int alen, blen;
  Alignment aln;
  Path apath;
  Path *bpath;
  Work_Data *work;
  Align_Spec *spec;
  int i;

  if (scanf("%lf %d %d %f %f %f %f", &ave_corr, &trace_space, &reach,
            freq, freq+1, freq+2, freq+3) != 7) return 1;
  if (scanf("%d %d %d %d", &flags, &low, &hgh, &anti) != 4) return 1;
  aseq = read_seq(&alen);
  bseq = read_seq(&blen);

  work = New_Work_Data();
  spec = New_Align_Spec(ave_corr, trace_space, freq, reach);

  aln.path = &apath;
  aln.flags = flags;
  aln.aseq = aseq; aln.alen = alen;
  aln.bseq = bseq; aln.blen = blen;

  bpath = Local_Alignment(&aln, work, spec, low, hgh, anti, -1, -1);
  if (bpath == NULL) return 1;

  printf("A %d %d %d %d %d %d\n", apath.abpos, apath.bbpos, apath.aepos,
         apath.bepos, apath.diffs, apath.tlen);
  for (i = 0; i < apath.tlen; i++)
    printf("%d ", ((unsigned short *) apath.trace)[i]);
  printf("\n");
  printf("B %d %d %d %d %d %d\n", bpath->abpos, bpath->bbpos, bpath->aepos,
         bpath->bepos, bpath->diffs, bpath->tlen);
  for (i = 0; i < bpath->tlen; i++)
    printf("%d ", ((unsigned short *) bpath->trace)[i]);
  printf("\n");
  return 0;
}
